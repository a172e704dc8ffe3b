"""DIAGNOSTICS_TS per-term tracer budgets (set_diags.F) + QCK surface
fields + DIA output stream."""

import os

import numpy as np

from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


def _setup():
    cfg = upwelling.make_config(dtype="float64")
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              vmix_fn=upwelling.make_vmix_fn(cfg))
    return cfg, grid, s0, m


class TestDiagnostics:
    def test_budget_closes(self):
        """rate = forc + hadv + vadv + vdif + nudg to roundoff in the
        interior (boundary rows are refreshed by bc_rho outside the
        budget, as in the reference's DiaTwrk accounting)."""
        cfg, grid, s0, m = _setup()
        s1, dia = m.step_diag(s0)
        res = np.asarray(dia["rate"] - (dia["forc"] + dia["hadv"] +
                                        dia["vadv"] + dia["vdif"] +
                                        dia["nudg"]))
        assert np.abs(res[:, :, 1:-1, :]).max() < 1e-10

    def test_diag_step_matches_plain_step(self):
        cfg, grid, s0, m = _setup()
        s1, _ = m.step_diag(s0)
        s1b = m.step(s0)
        assert np.abs(np.asarray(s1.t) - np.asarray(s1b.t)).max() == 0.0

    def test_dia_writer(self, tmp_path):
        from roms_tpu.io.netcdf import DiagWriter
        cfg, grid, s0, m = _setup()
        s1, dia = m.step_diag(s0)
        path = os.path.join(tmp_path, "dia.nc")
        w = DiagWriter(path, cfg, grid)
        w.write(dia, s1.time)
        w.close()
        from scipy.io import netcdf_file
        f = netcdf_file(path, "r", mmap=False)
        assert "temp_hadv" in f.variables
        assert f.variables["salt_vdif"].shape[0] == 1
        f.close()

    def test_qck_surface_fields(self, tmp_path):
        from roms_tpu.io.netcdf import HistoryWriter
        cfg, grid, s0, m = _setup()
        path = os.path.join(tmp_path, "qck.nc")
        w = HistoryWriter(path, cfg, grid,
                          fields=("zeta", "temp_sur", "u_sur"))
        w.write(s0)
        w.close()
        from scipy.io import netcdf_file
        f = netcdf_file(path, "r", mmap=False)
        Ts = f.variables["temp_sur"][0]
        assert Ts.shape == cfg.shape2d
        assert np.allclose(Ts, np.asarray(s0.t[0][-1]), atol=1e-5)
        f.close()


def test_dia_window_average(tmp_path):
    """NDIA>1 writes the WINDOW-AVERAGED budget (set_diags.F
    accumulation), not the last instantaneous step (round-4 ADVICE)."""
    from roms_tpu.io.output import OutputManager
    cfg = upwelling.make_config(Lm=10, Mm=12, N=4, dtype="float64")
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              vmix_fn=upwelling.make_vmix_fn(cfg))
    params = {"NDIA": 2, "Dout(iTrate)": [True, True],
              "DIANAME": "dia.nc"}
    om = OutputManager(cfg, grid, params, outdir=str(tmp_path),
                      initial_state=s0, model=m)
    assert om.wants_diag
    s, dias = s0, []
    for _ in range(2):
        s, dia = m.step_diag(s)
        dias.append(dia)
        om.step(s, diag=dia)
    om.close()
    from scipy.io import netcdf_file
    f = netcdf_file(str(tmp_path / "dia.nc"), "r", mmap=False)
    got = np.asarray(f.variables["temp_rate"][0])
    f.close()
    want = 0.5 * (np.asarray(dias[0]["rate"][0])
                  + np.asarray(dias[1]["rate"][0]))
    np.testing.assert_allclose(got, want.astype(np.float32),
                               rtol=2e-6, atol=1e-12)
