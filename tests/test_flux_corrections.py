"""QCORRECTION / SCORRECTION / SRELAXATION surface-flux corrections
(set_vbc.F:313-395, core/set_vbc.make_flux_correction) and the
DAMEE_4-class data-driven deck end-to-end."""

import os
import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.quick


class _Const:
    """TimeSeriesField stand-in with a constant value."""

    def __init__(self, val):
        self.val = jnp.asarray(val)

    def at(self, t):
        return self.val


@pytest.fixture(scope="module")
def setup():
    from roms_tpu.functionals import upwelling
    cfg = upwelling.make_config(Lm=16, Mm=8, N=6, dtype="float64")
    grid = upwelling.make_grid(cfg)
    s = upwelling.make_initial(cfg, grid)
    forcing = upwelling.make_forcing_fn(cfg, grid)(0.0)
    return cfg, grid, s, forcing


def test_qcorrection_formula(setup):
    from roms_tpu.core.set_vbc import make_flux_correction
    cfg, grid, s, forcing = setup
    sst_d = s.t[0, -1] - 2.0              # data 2 K colder than model
    dqdt = jnp.full(cfg.shape2d, -1.0e-5, s.t.dtype)
    hook = make_flux_correction(cfg, sst_fld=_Const(sst_d),
                                dqdt_fld=_Const(dqdt))
    out = hook(0.0, s.t, s.Hz, forcing)
    # stflx[T] += dqdt*(T_model - SST_data) = -1e-5 * 2 (cooling)
    np.testing.assert_allclose(
        np.asarray(out.stflx[0] - forcing.stflx[0]), -2.0e-5,
        rtol=1e-12)
    # salt flux untouched without a salt mode
    np.testing.assert_array_equal(np.asarray(out.stflx[1]),
                                  np.asarray(forcing.stflx[1]))


def test_srelaxation_formula(setup):
    from roms_tpu.core.set_vbc import make_flux_correction
    cfg, grid, s, forcing = setup
    sss_d = s.t[1, -1] + 0.5
    hook = make_flux_correction(cfg, sss_fld=_Const(sss_d),
                                tnudg_s_days=60.0,
                                salt_mode="srelaxation")
    out = hook(0.0, s.t, s.Hz, forcing)
    expect = -(1.0 / (60.0 * 86400.0)) * np.asarray(s.Hz[-1]) * (-0.5)
    np.testing.assert_allclose(np.asarray(out.stflx[1]), expect,
                               rtol=1e-12)


def test_scorrection_adds_to_emp(setup):
    from roms_tpu.core.set_vbc import make_flux_correction
    cfg, grid, s, forcing = setup
    f2 = forcing._replace(stflx=forcing.stflx.at[1].set(3.0e-6))
    sss_d = s.t[1, -1] + 0.5
    hook = make_flux_correction(cfg, sss_fld=_Const(sss_d),
                                tnudg_s_days=60.0,
                                salt_mode="scorrection")
    out = hook(0.0, s.t, s.Hz, f2)
    relax = -(1.0 / (60.0 * 86400.0)) * np.asarray(s.Hz[-1]) * (-0.5)
    np.testing.assert_allclose(np.asarray(out.stflx[1]),
                               3.0e-6 + relax, rtol=1e-12)


def test_model_integration(setup):
    """A model with the SST correction cools toward colder SST data."""
    from roms_tpu.core.set_vbc import make_flux_correction
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import upwelling
    cfg, grid, s, _ = setup
    sst_d = s.t[0, -1] - 3.0
    dqdt = jnp.full(cfg.shape2d, -5.0e-5, s.t.dtype)
    hook = make_flux_correction(cfg, sst_fld=_Const(sst_d),
                                dqdt_fld=_Const(dqdt))
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              vmix_fn=upwelling.make_vmix_fn(cfg), flux_corr_fn=hook)
    m0 = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
               vmix_fn=upwelling.make_vmix_fn(cfg))
    sc = m.run(s, 10)
    sb = m0.run(s, 10)
    dT = np.asarray(sc.t[0, -1] - sb.t[0, -1])[1:-1, 1:-1]
    assert dT.max() < 0.0        # corrected run is cooler everywhere


def test_damee4_deck_with_flux_corrections(capsys, tmp_path):
    """DAMEE_4-class deck: generated spherical grid + INI + an
    SST/dQdSST/SSS forcing file through ``python -m roms_tpu``."""
    from scipy.io import netcdf_file

    from roms_tpu.__main__ import main
    from roms_tpu.functionals import idealized
    from roms_tpu.io.grid_nc import write_grid_netcdf
    cfg = idealized.damee4_config(Lm=24, Mm=20, N=6)
    # small spherical shelf grid standing in for the Atlantic file
    Mj, Li = cfg.shape2d
    lon = np.linspace(-80.0, -60.0, Li)
    lat = np.linspace(10.0, 30.0, Mj)
    LON, LAT = np.meshgrid(lon, lat)
    dlat = (lat[1] - lat[0]) * 111.1e3
    dlon = (lon[1] - lon[0]) * 111.1e3 * np.cos(np.deg2rad(LAT))
    from roms_tpu.grid.grid import build_grid
    grid = build_grid(cfg, h=np.full((Mj, Li), 3000.0),
                      pm=1.0 / dlon, pn=np.full((Mj, Li), 1.0 / dlat),
                      f=2 * 7.2921e-5 * np.sin(np.deg2rad(LAT)),
                      xr=LON, yr=LAT, spherical=True)
    gpath = str(tmp_path / "damee_grd.nc")
    write_grid_netcdf(gpath, cfg, grid)

    fpath = str(tmp_path / "damee_frc.nc")
    f = netcdf_file(fpath, "w", version=2)
    f.createDimension("sst_time", 2)
    f.createDimension("sss_time", 2)
    f.createDimension("eta_rho", Mj)
    f.createDimension("xi_rho", Li)
    for tname in ("sst_time", "sss_time"):
        tv = f.createVariable(tname, "d", (tname,))
        tv[:] = np.array([0.0, 30.0 * 86400.0])
        tv.units = "seconds"
    for vname, tname, val in (("SST", "sst_time", 18.0),
                              ("dQdSST", "sst_time", -3.0e-5),
                              ("SSS", "sss_time", 36.0)):
        v = f.createVariable(vname, "d", (tname, "eta_rho", "xi_rho"))
        v[:] = np.full((2, Mj, Li), val)
    f.flush()
    f.close()

    deck = str(tmp_path / "roms_damee_4.in")
    with open(deck, "w") as fh:
        fh.write(f"""
TITLE = DAMEE 4 reduced
MyAppCPP == DAMEE_4
Lm == 24
Mm == 20
N == 6
NTIMES == 2
DT == 600.0d0
NDTFAST == 15
NRREC == 0
TNUDG == 60.0d0 60.0d0
GRDNAME == {gpath}
FRCNAME == {fpath}
NHIS == 0
NRST == 0
NINFO == 0
""")
    rc = main([deck, "--outdir", str(tmp_path), "--dtype", "float64"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "surface flux corrections active" in out
    assert "grid from file" in out


def test_wc13_deck_end_to_end(capsys, tmp_path):
    """WC13-class deck: generated spherical grid, GLS+bulk header
    physics, runs from rest (the 4D-Var drivers sit in assim/)."""
    from roms_tpu.__main__ import main
    from roms_tpu.functionals import idealized
    from roms_tpu.grid.grid import build_grid
    from roms_tpu.io.grid_nc import write_grid_netcdf
    cfg = idealized.wc13_config(Lm=20, Mm=16, N=6)
    Mj, Li = cfg.shape2d
    lon = np.linspace(-134.0, -118.0, Li)
    lat = np.linspace(30.0, 41.0, Mj)
    LON, LAT = np.meshgrid(lon, lat)
    dlat = (lat[1] - lat[0]) * 111.1e3
    dlon = (lon[1] - lon[0]) * 111.1e3 * np.cos(np.deg2rad(LAT))
    grid = build_grid(cfg, h=np.full((Mj, Li), 2000.0),
                      pm=1.0 / dlon, pn=np.full((Mj, Li), 1.0 / dlat),
                      f=2 * 7.2921e-5 * np.sin(np.deg2rad(LAT)),
                      xr=LON, yr=LAT, spherical=True)
    gpath = str(tmp_path / "wc13_grd.nc")
    write_grid_netcdf(gpath, cfg, grid)
    deck = str(tmp_path / "roms_wc13.in")
    with open(deck, "w") as fh:
        fh.write(f"""
TITLE = WC13 reduced
MyAppCPP == WC13
Lm == 20
Mm == 16
N == 6
NTIMES == 2
DT == 600.0d0
NDTFAST == 15
NRREC == 0
GRDNAME == {gpath}
NHIS == 0
NRST == 0
NINFO == 0
""")
    rc = main([deck, "--outdir", str(tmp_path), "--dtype", "float64"])
    assert rc == 0
    assert "grid from file" in capsys.readouterr().out
