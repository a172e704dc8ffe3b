"""Writer field-surface parity (VERDICT round-3 item 3): extraction is
driven by the VarInfo location codes, so every deck-selectable field —
bio/sediment/ice tracers, bottom stress, hsbl/hbbl, AKv/AKt/AKs, bed
layers — is writable, and `OutputManager.unsupported` is empty for a
full-physics deck (wrt_his.F field dispatch, varinfo.yaml id set)."""

import os
import tempfile

import numpy as np
import pytest
from scipy.io import netcdf_file

from roms_tpu.core import stepping
from roms_tpu.functionals import benchmark, upwelling
from roms_tpu.io.netcdf import supported_keys
from roms_tpu.io.output import OutputManager
from roms_tpu.io.varinfo import varinfo_for


class TestSupportedKeys:
    def test_named_bio_tracers_supported(self):
        cfg = upwelling.make_config().replace(
            NT=4, tracer_names=("NO3", "NH4"))
        ok = supported_keys(cfg)
        assert {"NO3", "NH4", "NO3_sur"} <= ok

    def test_kpp_diagnostics_require_model(self):
        cfg = benchmark.make_config(full_physics=True)
        base = supported_keys(cfg)
        assert "hsbl" not in base and "bustr" not in base
        grid = benchmark.make_grid(cfg)
        model = stepping.Model(
            cfg, grid, forcing_fn=benchmark.make_bulk_forcing_fn(cfg,
                                                                 grid))
        ok = supported_keys(cfg, model)
        assert {"hsbl", "AKv", "AKt", "AKs", "bustr", "bvstr",
                "sustr", "svstr", "shflux", "swrad"} <= ok

    def test_synthesized_varinfo_locations(self):
        assert varinfo_for("PhyC1").location == "r3"
        assert varinfo_for("PhyC1_sur").location == "r2"
        assert varinfo_for("bed_thickness").location == "b3"
        assert varinfo_for("bedldu_03").location == "u2"
        assert varinfo_for("u_prsgrd").location == "u3"
        assert varinfo_for("v_vvisc").location == "v3"


@pytest.fixture(scope="module")
def kpp_model():
    cfg = benchmark.make_config(full_physics=True, Lm=32, Mm=16, N=8)
    grid = benchmark.make_grid(cfg)
    state = benchmark.make_initial(cfg, grid)
    model = stepping.Model(
        cfg, grid, forcing_fn=benchmark.make_bulk_forcing_fn(cfg, grid))
    return cfg, grid, state, model


class TestDiagnosedFields:
    def test_full_physics_his_file_complete(self, kpp_model):
        """A full-physics deck requesting the whole registry surface
        produces a complete file with zero unsupported ids."""
        cfg, grid, state, model = kpp_model
        params = {
            "NHIS": 1, "HISNAME": "his.nc",
            "Hout(idFsur)": True, "Hout(idUbar)": True,
            "Hout(idVbar)": True, "Hout(idUvel)": True,
            "Hout(idVvel)": True, "Hout(idTvar)": [True, True],
            "Hout(idDano)": True, "Hout(idWvel)": True,
            "Hout(idOvel)": True, "Hout(idVvis)": True,
            "Hout(idTdif)": True, "Hout(idSdif)": True,
            "Hout(idHsbl)": True, "Hout(idUsms)": True,
            "Hout(idVsms)": True, "Hout(idUbms)": True,
            "Hout(idVbms)": True, "Hout(idTsur)": True,
            "Hout(idSrad)": True,
        }
        with tempfile.TemporaryDirectory() as d:
            om = OutputManager(cfg, grid, params, outdir=d,
                               initial_state=state, model=model)
            assert om.unsupported == [], om.unsupported
            s = model.step(state)
            om.step(s)
            om.close()
            f = netcdf_file(os.path.join(d, "his.nc"), "r", mmap=False)
            for var in ("zeta", "u", "temp", "rho", "w", "AKv", "AKt",
                        "AKs", "Hsbl", "sustr", "bustr", "shflux",
                        "swrad"):
                assert var in f.variables, var
                val = np.asarray(f.variables[var][0])
                assert np.isfinite(val).all(), var
            # KPP boundary layer must be a negative depth somewhere
            hsbl = np.asarray(f.variables["Hsbl"][0])
            assert hsbl.min() < 0.0
            # bottom stress nonzero (quadratic drag on moving fluid)
            f.close()

    def test_diagnosed_matches_step_forcing(self, kpp_model):
        """The written sustr equals the forcing the step applied."""
        cfg, grid, state, model = kpp_model
        d = model.diagnose(state)
        sss = np.asarray(state.t[1][-1])
        # recompute via the forcing path used by step_impl
        from roms_tpu.core.rho_eos import rho_eos
        rho = rho_eos(cfg, state.t, state.z_r, state.Hz, state.z_w)[0]
        f = model.forcing_fn(state.time, state.t[0][-1],
                             state.t[1][-1], rho[-1])
        np.testing.assert_allclose(np.asarray(d["sustr"]),
                                   np.asarray(f.sustr), rtol=1e-4,
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(d["shflux"]),
                                   np.asarray(f.stflx[0]), rtol=1e-3,
                                   atol=1e-9)


class TestBioSedIceWriting:
    def test_bio_tracer_and_bed_fields_written(self):
        """NT=4 config with named bio tracers + sediment bed: the deck
        Hout(idTvar) per-tracer flags cover all four tracers and bed
        fields write with the Nbed dimension."""
        import jax.numpy as jnp

        from roms_tpu.core.sed_bed import initial_bed
        from roms_tpu.core.sediment import SedConfig
        from roms_tpu.core.state import initial_state

        cfg = upwelling.make_config().replace(
            NT=4, tracer_names=("NO3", "NH4"))
        grid = upwelling.make_grid(cfg)
        sedcfg = SedConfig()
        bed = initial_bed(cfg, sedcfg, nbed=3)
        state = initial_state(cfg, grid, sed=bed)

        def sed_fn(t, sed, Hz, bustr, bvstr):
            return jnp.zeros_like(t), sed

        model = stepping.Model(
            cfg, grid, forcing_fn=upwelling.make_forcing_fn(cfg, grid),
            vmix_fn=upwelling.make_vmix_fn(cfg), sed_fn=sed_fn)
        params = {
            "NHIS": 1, "HISNAME": "his.nc",
            "Hout(idTvar)": [True, True, True, True],
        }
        with tempfile.TemporaryDirectory() as d:
            om = OutputManager(cfg, grid, params, outdir=d,
                               initial_state=state, model=model,
                               his_fields=None)
            assert om.unsupported == []
            # bed fields go through the explicit field list
            om2 = OutputManager(
                cfg, grid, {"NHIS": 1, "HISNAME": "his2.nc"}, outdir=d,
                initial_state=state, model=model,
                his_fields=("zeta", "NO3", "NH4", "bed_thickness",
                            "bed_porosity"))
            s = model.step(state)
            om.step(s)
            om2.step(s)
            om.close()
            om2.close()
            f = netcdf_file(os.path.join(d, "his.nc"), "r", mmap=False)
            for var in ("temp", "salt", "NO3", "NH4"):
                assert var in f.variables, var
            f.close()
            f = netcdf_file(os.path.join(d, "his2.nc"), "r",
                            mmap=False)
            bt = f.variables["bed_thickness"]
            assert bt.shape[1] == 3            # Nbed
            assert np.isfinite(np.asarray(bt[0])).all()
            assert "NO3" in f.variables
            f.close()


class TestDiaStream:
    def test_dout_switches_drive_dia_file(self):
        cfg = upwelling.make_config(Lm=16, Mm=12, N=6)
        grid = upwelling.make_grid(cfg)
        state = upwelling.make_initial(cfg, grid)
        model = stepping.Model(
            cfg, grid, forcing_fn=upwelling.make_forcing_fn(cfg, grid),
            vmix_fn=upwelling.make_vmix_fn(cfg))
        params = {
            "NDIA": 1, "DIANAME": "dia.nc",
            "Dout(iTrate)": [True, True],
            "Dout(iThadv)": [True, True],
            "Dout(iTvadv)": [True, True],
            "Dout(iTvdif)": [True, True],
        }
        with tempfile.TemporaryDirectory() as d:
            om = OutputManager(cfg, grid, params, outdir=d,
                               initial_state=state, model=model)
            assert om.wants_diag
            assert om.unsupported == []
            s, dia = model.step_diag(state)
            om.step(s, diag=dia)
            om.close()
            f = netcdf_file(os.path.join(d, "dia.nc"), "r", mmap=False)
            for var in ("temp_rate", "temp_hadv", "salt_vdif",
                        "temp_nudg"):
                assert var in f.variables, var
            # budget closes: rate = forc + hadv + vadv + vdif + nudg
            rate = np.asarray(f.variables["temp_rate"][0], np.float64)
            tot = sum(np.asarray(f.variables[f"temp_{t}"][0],
                                 np.float64)
                      for t in ("forc", "hadv", "vadv", "vdif",
                                "nudg"))
            err = np.abs(rate - tot)[:, 2:-2, 2:-2].max()
            assert err < 1e-4 * max(np.abs(rate).max(), 1e-12)
            f.close()


class TestDiagUV:
    def test_uv_budget_closes_and_writes(self):
        """DIAGNOSTICS_UV (set_diags.F momentum budgets): the
        Hz-weighted per-step increments close — rate = pre + prsgrd +
        cor + hadv + vadv + hvisc + vvisc + cpl — and Dout(M3*)
        switches produce the DIA-UV file."""
        cfg = upwelling.make_config(Lm=16, Mm=12, N=6,
                                    dtype="float64")
        grid = upwelling.make_grid(cfg)
        state = upwelling.make_initial(cfg, grid)
        model = stepping.Model(
            cfg, grid, forcing_fn=upwelling.make_forcing_fn(cfg, grid),
            vmix_fn=upwelling.make_vmix_fn(cfg))
        # spin up so every term is nonzero
        state = model.run(state, 3)
        s2, dia_uv = model.step_diag_uv(state)
        rate = np.asarray(dia_uv["u_rate"], np.float64)
        tot = sum(np.asarray(dia_uv[f"u_{t}"], np.float64)
                  for t in ("pre", "prsgrd", "cor", "hadv", "vadv",
                            "hvisc", "vvisc", "cpl"))
        err = np.abs(rate - tot)[:, 2:-2, 2:-2].max()
        scale = max(np.abs(rate).max(), 1e-30)
        assert err < 1e-10 * scale + 1e-18, (err, scale)
        ratev = np.asarray(dia_uv["v_rate"], np.float64)
        totv = sum(np.asarray(dia_uv[f"v_{t}"], np.float64)
                   for t in ("pre", "prsgrd", "cor", "hadv", "vadv",
                             "hvisc", "vvisc", "cpl"))
        errv = np.abs(ratev - totv)[:, 2:-2, 2:-2].max()
        assert errv < 1e-10 * max(np.abs(ratev).max(), 1e-30) + 1e-18
        # pressure gradient must be active after spin-up (UPWELLING is
        # x-uniform, so the signal is in the v budget)
        assert np.abs(np.asarray(dia_uv["v_prsgrd"])).max() > 0.0

        params = {
            "NDIA": 1, "DIANAME": "dia.nc",
            "Dout(M3rate)": True, "Dout(M3pgrd)": True,
            "Dout(M3fcor)": True, "Dout(M3hadv)": True,
            "Dout(M3vadv)": True, "Dout(M3hvis)": True,
            "Dout(M3vvis)": True,
        }
        with tempfile.TemporaryDirectory() as d:
            om = OutputManager(cfg, grid, params, outdir=d,
                               initial_state=state, model=model)
            assert om.wants_diag_uv
            assert not any(u.startswith("M3")
                           for u in om.unsupported), om.unsupported
            om.step(s2, diag_uv=dia_uv)
            om.close()
            f = netcdf_file(os.path.join(d, "roms_dia_uv.nc"), "r",
                            mmap=False)
            for var in ("u_rate", "u_prsgrd", "v_cor", "u_vvisc",
                        "v_cpl"):
                assert var in f.variables, var
                assert np.isfinite(np.asarray(
                    f.variables[var][0])).all(), var
            f.close()


def test_bulk_component_fields_written(kpp_model):
    """Bulk-flux component diagnostics (idLrad/idLhea/idShea/idrain/
    idEmPf + atmosphere state) extract through Model.diagnose for a
    BENCHMARK bulk-forced run."""
    cfg, grid, state, model = kpp_model
    params = {
        "NHIS": 1, "HISNAME": "his.nc",
        "Hout(idLrad)": True, "Hout(idLhea)": True,
        "Hout(idShea)": True, "Hout(idrain)": True,
        "Hout(idEmPf)": True, "Hout(idPair)": True,
        "Hout(idTair)": True, "Hout(idUair)": True,
        "Hout(idVair)": True,
    }
    with tempfile.TemporaryDirectory() as d:
        om = OutputManager(cfg, grid, params, outdir=d,
                           initial_state=state, model=model)
        assert om.unsupported == [], om.unsupported
        s = model.step(state)
        om.step(s)
        om.close()
        f = netcdf_file(os.path.join(d, "his.nc"), "r", mmap=False)
        for var in ("lwrad", "latent", "sensible", "rain", "EminusP",
                    "Pair", "Tair", "Uwind", "Vwind"):
            assert var in f.variables, var
            assert np.isfinite(np.asarray(f.variables[var][0])).all()
        # longwave cools (negative) over the warm benchmark ocean
        assert np.asarray(f.variables["lwrad"][0]).mean() < 0.0
        f.close()
