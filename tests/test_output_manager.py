"""output.F-analog dispatcher: a reference input deck drives the same
stream files (HIS/QCK/AVG/RST) at its own cadences and Hout switches."""

import os
import tempfile

import numpy as np
import pytest
from scipy.io import netcdf_file

from roms_tpu.core import stepping
from roms_tpu.functionals import upwelling
from roms_tpu.io.output import OutputManager


@pytest.fixture(scope="module")
def model():
    cfg = upwelling.make_config(Lm=16, Mm=18, N=8)
    grid = upwelling.make_grid(cfg)
    state = upwelling.make_initial(cfg, grid)
    m = stepping.Model(cfg, grid,
                       forcing_fn=upwelling.make_forcing_fn(cfg, grid))
    return cfg, grid, state, m


def test_deck_driven_streams(model):
    """Cadences and field switches come straight from the reference
    UPWELLING deck (scaled down); all four streams are produced."""
    cfg, grid, s, m = model
    params = {
        "NHIS": 2, "NQCK": 0, "NAVG": 3, "NRST": 3,
        "LcycleRST": True,
        "HISNAME": "his.nc", "AVGNAME": "avg.nc", "RSTNAME": "rst.nc",
        "Hout(idFsur)": True, "Hout(idUbar)": True,
        "Hout(idVbar)": False, "Hout(idTvar)": [True, False],
        "Hout(idUsms)": True,     # unsupported extraction -> recorded
    }
    with tempfile.TemporaryDirectory() as d:
        om = OutputManager(cfg, grid, params, outdir=d,
                           initial_state=s)
        assert any(u.startswith("idUsms") for u in om.unsupported)
        for _ in range(6):
            s = m.step(s)
            om.step(s)
        om.close()

        f = netcdf_file(os.path.join(d, "his.nc"), "r", mmap=False)
        assert set(f.variables).issuperset({"zeta", "ubar", "temp"})
        assert "vbar" not in f.variables
        assert f.variables["zeta"].shape[0] == 3      # steps 2,4,6
        f.close()

        f = netcdf_file(os.path.join(d, "avg.nc"), "r", mmap=False)
        assert f.variables["zeta"].shape[0] == 2      # windows 1-3, 4-6
        # averaging window center: (t1 + t3)/2
        t = f.variables["ocean_time"][:2]
        assert abs(t[0] - 2.0 * cfg.dt) < 1e-6
        f.close()

        f = netcdf_file(os.path.join(d, "rst.nc"), "r", mmap=False)
        iics = f.variables["nsteps"][:2]
        assert sorted(iics) == [3, 6]                 # cycling 2-record
        f.close()


def test_avg_matches_hand_mean(model):
    cfg, grid, s0, m = model
    states = [s0]
    for _ in range(4):
        states.append(m.step(states[-1]))
    with tempfile.TemporaryDirectory() as d:
        om = OutputManager(cfg, grid, {"NAVG": 4, "AVGNAME": "a.nc"},
                           outdir=d)
        for s in states[1:]:
            om.step(s)
        om.close()
        f = netcdf_file(os.path.join(d, "a.nc"), "r", mmap=False)
        got = np.asarray(f.variables["zeta"][0])
        f.close()
    want = np.mean([np.asarray(s.zeta) for s in states[1:]], axis=0)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=2e-6)


def test_derived_fields_written(model):
    """The UPWELLING deck's Hout asks for w/omega/rho (idWvel/idOvel/
    idDano) — derived at write time like wrt_his.F:935-1024."""
    cfg, grid, s, m = model
    params = {"NHIS": 1, "HISNAME": "his.nc",
              "Hout(idFsur)": True, "Hout(idWvel)": True,
              "Hout(idOvel)": True, "Hout(idDano)": True}
    with tempfile.TemporaryDirectory() as d:
        om = OutputManager(cfg, grid, params, outdir=d)
        assert om.unsupported == []
        s = m.step(s)
        om.step(s)
        om.close()
        f = netcdf_file(os.path.join(d, "his.nc"), "r", mmap=False)
        for name in ("w", "omega", "rho"):
            v = np.asarray(f.variables[name][0])
            assert v.shape[-2:] == cfg.shape2d
            assert np.isfinite(v).all(), name
        # omega is W*pm*pn with zero top/bottom interface flux
        om0 = np.asarray(f.variables["omega"][0])
        assert abs(om0[0]).max() == 0.0 and abs(om0[-1]).max() < 1e-12
        f.close()


def test_ninfo_diag_table(model, capsys):
    """NINFO cadence prints the reference-style diagnostics table
    (diag.F:440-486)."""
    cfg, grid, s, m = model
    om = OutputManager(cfg, grid, {"NINFO": 2})
    for _ in range(4):
        s = m.step(s)
        om.step(s)
    outtxt = capsys.readouterr().out
    assert "KINETIC_ENRG" in outtxt and "NET_VOLUME" in outtxt
    assert len([ln for ln in outtxt.splitlines()
                if ln.strip() and ln.split()[0].isdigit()]) == 2
