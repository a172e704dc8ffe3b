"""File-based application data path (the realistic-app ingest layer).

Round-trips the repo's own writers through the new readers and checks
the model consumes file data identically to in-memory data:

  - grid file ingest/export (get_grid.F analog, io/grid_nc.py)
  - initial state from INI/HIS-layout NetCDF (get_state.F analog,
    io/state_nc.py), incl. standard short staggered dims (xi_u=Lm+1)
  - open-boundary data from BRY files (get_data.F BRY branch,
    io/bry_nc.py) driving clamped OBCs
  - climatology + nudging from CLM files (get_data.F CLM branch,
    io/clm_nc.py)
  - tide harmonics files (get_idata.F analog, io/tide_nc.py) incl.
    current-ellipse -> component-harmonic conversion
  - the deck-driven driver running a custom (non-analytic) application
    entirely from files (GRDNAME/ININAME/BRYNAME keywords)
"""

import dataclasses
import os
import tempfile

import numpy as np
import pytest

from roms_tpu import config as C
from roms_tpu.config import LBC, BoundaryConfig
from roms_tpu.core import stepping
from roms_tpu.core.state import initial_state
from roms_tpu.functionals import upwelling


def small_cfg(**kw):
    cfg = upwelling.make_config(Lm=12, Mm=10, N=6, dt=60.0, ndtfast=10,
                                dtype="float64")
    return cfg.replace(**kw) if kw else cfg


def zero_forcing(cfg):
    from roms_tpu.functionals import idealized
    return idealized.zero_forcing(cfg)


# ---------------------------------------------------------------------------
# grid files
# ---------------------------------------------------------------------------

def test_grid_roundtrip_and_step():
    from roms_tpu.io.grid_nc import (load_grid_netcdf, read_grid_dims,
                                     write_grid_netcdf)
    cfg = small_cfg()
    g0 = upwelling.make_grid(cfg)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "grid.nc")
        write_grid_netcdf(path, cfg, g0)
        assert read_grid_dims(path) == (cfg.Lm, cfg.Mm)
        g1 = load_grid_netcdf(path, cfg)

    for name in ("h", "pm", "pn", "f", "angler", "rmask", "umask",
                 "vmask", "om_u", "on_v", "pmon_r", "dndx"):
        np.testing.assert_allclose(np.asarray(getattr(g1, name)),
                                   np.asarray(getattr(g0, name)),
                                   rtol=0, atol=1e-14, err_msg=name)

    # trajectories on the two grids are identical
    s0 = upwelling.make_initial(cfg, g0)
    mA = stepping.Model(cfg, g0, upwelling.make_forcing_fn(cfg, g0),
                        vmix_fn=upwelling.make_vmix_fn(cfg))
    mB = stepping.Model(cfg, g1, upwelling.make_forcing_fn(cfg, g1),
                        vmix_fn=upwelling.make_vmix_fn(cfg))
    sA, sB = s0, s0
    for _ in range(2):
        sA = mA.step(sA)
        sB = mB.step(sB)
    np.testing.assert_array_equal(np.asarray(sA.zeta), np.asarray(sB.zeta))
    np.testing.assert_array_equal(np.asarray(sA.t), np.asarray(sB.t))


def test_grid_missing_required_raises():
    from scipy.io import netcdf_file
    from roms_tpu.io.grid_nc import load_grid_netcdf
    cfg = small_cfg()
    Mj, Li = cfg.shape2d
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "bad.nc")
        f = netcdf_file(path, "w", version=2)
        f.createDimension("xi_rho", Li)
        f.createDimension("eta_rho", Mj)
        v = f.createVariable("h", "d", ("eta_rho", "xi_rho"))
        v[:] = np.ones((Mj, Li))
        f.close()
        with pytest.raises(ValueError, match="pm"):
            load_grid_netcdf(path, cfg)


# ---------------------------------------------------------------------------
# initial-state files
# ---------------------------------------------------------------------------

def test_ini_reader_standard_staggered_dims():
    """Read a file in STANDARD reference layout (xi_u = Lm+1,
    eta_v = Mm+1, i.e. one shorter than this repo's uniform shape)."""
    from scipy.io import netcdf_file
    from roms_tpu.io.state_nc import read_state_netcdf
    cfg = small_cfg()
    grid = upwelling.make_grid(cfg)
    Mj, Li = cfg.shape2d
    N = cfg.N
    rng = np.random.default_rng(7)
    zeta = 0.01 * rng.standard_normal((Mj, Li))
    u = 0.1 * rng.standard_normal((N, Mj, Li - 1))
    v = 0.1 * rng.standard_normal((N, Mj - 1, Li))
    temp = 10.0 + rng.standard_normal((N, Mj, Li))

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ini.nc")
        f = netcdf_file(path, "w", version=2)
        f.createDimension("ocean_time", None)
        for dim, n in (("xi_rho", Li), ("xi_u", Li - 1), ("xi_v", Li),
                       ("eta_rho", Mj), ("eta_u", Mj), ("eta_v", Mj - 1),
                       ("s_rho", N)):
            f.createDimension(dim, n)
        vt = f.createVariable("ocean_time", "d", ("ocean_time",))
        vz = f.createVariable("zeta", "d",
                              ("ocean_time", "eta_rho", "xi_rho"))
        vu = f.createVariable("u", "d",
                              ("ocean_time", "s_rho", "eta_u", "xi_u"))
        vv = f.createVariable("v", "d",
                              ("ocean_time", "s_rho", "eta_v", "xi_v"))
        vT = f.createVariable("temp", "d",
                              ("ocean_time", "s_rho", "eta_rho", "xi_rho"))
        vt[0] = 3600.0
        vz[0] = zeta
        vu[0] = u
        vv[0] = v
        vT[0] = temp
        f.flush()
        f.close()

        s = read_state_netcdf(path, cfg, grid)

    assert float(s.time) == 3600.0
    np.testing.assert_allclose(np.asarray(s.zeta), zeta, atol=1e-14)
    # short staggered arrays land at internal indices 1: (ghost padded)
    np.testing.assert_allclose(np.asarray(s.u)[:, :, 1:], u, atol=1e-14)
    np.testing.assert_allclose(np.asarray(s.v)[:, 1:, :], v, atol=1e-14)
    np.testing.assert_allclose(np.asarray(s.t)[0], temp, atol=1e-14)
    # salt absent from the file -> rest value
    assert float(np.abs(np.asarray(s.t)[1]).max()) == 0.0
    # derived depths were rebuilt for the file zeta
    assert np.isfinite(np.asarray(s.Hz)).all()


def test_ini_roundtrip_through_own_writer_layout():
    """initial_state -> uniform-layout file -> read -> same state."""
    from scipy.io import netcdf_file
    from roms_tpu.io.state_nc import read_state_netcdf
    cfg = small_cfg()
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    Mj, Li = cfg.shape2d
    N = cfg.N
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "his.nc")
        f = netcdf_file(path, "w", version=2)
        f.createDimension("ocean_time", None)
        for dim, n in (("xi_rho", Li), ("eta_rho", Mj), ("s_rho", N)):
            f.createDimension(dim, n)
        vt = f.createVariable("ocean_time", "d", ("ocean_time",))
        names = {"zeta": ("eta_rho", "xi_rho"),
                 "temp": ("s_rho", "eta_rho", "xi_rho"),
                 "salt": ("s_rho", "eta_rho", "xi_rho")}
        vars_ = {k: f.createVariable(k, "d", ("ocean_time",) + dims)
                 for k, dims in names.items()}
        vt[0] = 0.0
        vars_["zeta"][0] = np.asarray(s0.zeta)
        vars_["temp"][0] = np.asarray(s0.t[0])
        vars_["salt"][0] = np.asarray(s0.t[1])
        f.flush()
        f.close()
        s1 = read_state_netcdf(path, cfg, grid)
    np.testing.assert_array_equal(np.asarray(s1.t), np.asarray(s0.t))
    np.testing.assert_array_equal(np.asarray(s1.zeta),
                                  np.asarray(s0.zeta))


# ---------------------------------------------------------------------------
# boundary (BRY) files
# ---------------------------------------------------------------------------

def _write_bry(path, cfg, times, zeta_w, temp_w, time_units="seconds"):
    from scipy.io import netcdf_file
    Mj, Li = cfg.shape2d
    N = cfg.N
    f = netcdf_file(path, "w", version=2)
    f.createDimension("bry_time", len(times))
    f.createDimension("eta_rho", Mj)
    f.createDimension("s_rho", N)
    vt = f.createVariable("bry_time", "d", ("bry_time",))
    vt.units = time_units
    vt[:] = times if time_units.startswith("sec") else times / 86400.0
    vz = f.createVariable("zeta_west", "d", ("bry_time", "eta_rho"))
    vz.time = "bry_time"
    vz[:] = zeta_w
    vT = f.createVariable("temp_west", "d",
                          ("bry_time", "s_rho", "eta_rho"))
    vT.time = "bry_time"
    vT[:] = temp_w
    f.flush()
    f.close()


def _clamped_west_cfg():
    closed = LBC.same(C.CLOSED)
    cfg = small_cfg()
    return cfg.replace(bc=BoundaryConfig(
        zeta=dataclasses.replace(closed, west=C.CLAMPED),
        ubar=closed, vbar=closed, u=closed, v=closed,
        t=dataclasses.replace(closed, west=C.CLAMPED),
        tke=closed))


def test_bry_file_matches_inmemory_obc():
    from roms_tpu.io.bry_nc import load_bry_netcdf, make_bry_obc_fn
    from roms_tpu.io.forcing import TimeSeriesField
    cfg = _clamped_west_cfg()
    grid = upwelling.make_grid(cfg)
    Mj, _ = cfg.shape2d
    N = cfg.N
    times = np.array([0.0, 300.0, 900.0])
    zeta_w = 0.05 * np.sin(np.linspace(0, 1, 3))[:, None] \
        * np.ones((1, Mj))
    temp_w = 12.0 + np.linspace(0, 1, 3)[:, None, None] \
        * np.ones((1, N, Mj))

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "bry.nc")
        _write_bry(path, cfg, times, zeta_w, temp_w)
        fields = load_bry_netcdf(path, cfg)
        obc_file = make_bry_obc_fn(cfg, fields)

    assert set(fields) == {"zeta", "temp"}
    tsf_z = TimeSeriesField(times, zeta_w)
    tsf_T = TimeSeriesField(times, temp_w)

    def obc_mem(time):
        return {"zeta": {"west": tsf_z.at(time)},
                "t": {0: {"west": tsf_T.at(time)}}}

    s0 = upwelling.make_initial(cfg, grid)
    mA = stepping.Model(cfg, grid, zero_forcing(cfg), obc_fn=obc_file)
    mB = stepping.Model(cfg, grid, zero_forcing(cfg), obc_fn=obc_mem)
    sA, sB = s0, s0
    for _ in range(3):
        sA = mA.step(sA)
        sB = mB.step(sB)
    np.testing.assert_array_equal(np.asarray(sA.zeta),
                                  np.asarray(sB.zeta))
    np.testing.assert_array_equal(np.asarray(sA.t), np.asarray(sB.t))
    # the clamped values actually landed on the ghost line (boundary
    # data is interpolated once per baroclinic step, at entry time)
    t_entry = float(sA.time) - cfg.dt
    zc = tsf_z.at(t_entry)
    np.testing.assert_allclose(np.asarray(sA.zeta)[1:-1, 0],
                               np.asarray(zc)[1:-1], atol=1e-12)
    np.testing.assert_allclose(np.asarray(sA.t)[0, :, 1:-1, 0],
                               np.asarray(tsf_T.at(t_entry))[:, 1:-1],
                               atol=1e-12)


def test_bry_day_units_and_cycle():
    """Day-unit time axes convert to seconds; cycle_length wraps."""
    from scipy.io import netcdf_file
    from roms_tpu.io.bry_nc import load_bry_netcdf
    cfg = small_cfg()
    Mj, _ = cfg.shape2d
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "bry.nc")
        f = netcdf_file(path, "w", version=2)
        f.createDimension("bry_time", 2)
        f.createDimension("eta_rho", Mj)
        vt = f.createVariable("bry_time", "d", ("bry_time",))
        vt.units = "days"
        vt.cycle_length = 10.0
        vt[:] = np.array([2.5, 7.5])
        vz = f.createVariable("zeta_west", "d", ("bry_time", "eta_rho"))
        vz[:] = np.stack([np.full(Mj, 1.0), np.full(Mj, 3.0)])
        f.flush()
        f.close()
        fields = load_bry_netcdf(path, cfg)
    tsf = fields["zeta"]["west"]
    assert tsf.cycle == 10.0 * 86400.0
    # midpoint of the two records
    val = np.asarray(tsf.at(5.0 * 86400.0))
    np.testing.assert_allclose(val, 2.0, atol=1e-12)
    # cycling: t = 15 days == 5 days
    val2 = np.asarray(tsf.at(15.0 * 86400.0))
    np.testing.assert_allclose(val2, 2.0, atol=1e-12)


# ---------------------------------------------------------------------------
# climatology (CLM) files
# ---------------------------------------------------------------------------

def test_clm_file_matches_inmemory_and_nudges():
    import jax.numpy as jnp
    from scipy.io import netcdf_file
    from roms_tpu.io.clm_nc import load_clm_netcdf, make_clm_fn
    cfg = small_cfg()
    grid = upwelling.make_grid(cfg)
    Mj, Li = cfg.shape2d
    N = cfg.N
    tclm = np.full((N, Mj, Li), 20.0)
    sclm = np.full((N, Mj, Li), 35.0)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "clm.nc")
        f = netcdf_file(path, "w", version=2)
        f.createDimension("clm_time", 2)
        for dim, n in (("xi_rho", Li), ("eta_rho", Mj), ("s_rho", N)):
            f.createDimension(dim, n)
        vt = f.createVariable("clm_time", "d", ("clm_time",))
        vt[:] = np.array([0.0, 1.0e7])
        for nm, arr in (("temp", tclm), ("salt", sclm)):
            v = f.createVariable(nm, "d",
                                 ("clm_time", "s_rho", "eta_rho",
                                  "xi_rho"))
            v[:] = np.stack([arr, arr])
        f.flush()
        f.close()
        fields = load_clm_netcdf(path, cfg)

    clm_file = make_clm_fn(cfg, fields, tnudg_days=[0.5, 0.5])

    coef = 1.0 / (0.5 * 86400.0)
    Tc = jnp.asarray([coef, coef])[:, None, None, None]

    def clm_mem(time):
        return {"tclm": jnp.stack([jnp.asarray(tclm), jnp.asarray(sclm)]),
                "Tnudgcof": Tc}

    s0 = upwelling.make_initial(cfg, grid)
    mA = stepping.Model(cfg, grid, zero_forcing(cfg), clm_fn=clm_file)
    mB = stepping.Model(cfg, grid, zero_forcing(cfg), clm_fn=clm_mem)
    mC = stepping.Model(cfg, grid, zero_forcing(cfg))
    sA = sB = sC = s0
    for _ in range(3):
        sA = mA.step(sA)
        sB = mB.step(sB)
        sC = mC.step(sC)
    np.testing.assert_array_equal(np.asarray(sA.t), np.asarray(sB.t))
    # nudging pulls temp toward the (warmer) climatology
    gapA = np.abs(np.asarray(sA.t[0]) - 20.0).mean()
    gapC = np.abs(np.asarray(sC.t[0]) - 20.0).mean()
    assert gapA < gapC


def test_nudgcoef_file():
    from scipy.io import netcdf_file
    from roms_tpu.io.clm_nc import load_nudgcoef_netcdf
    cfg = small_cfg()
    Mj, Li = cfg.shape2d
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "nud.nc")
        f = netcdf_file(path, "w", version=2)
        f.createDimension("xi_rho", Li)
        f.createDimension("eta_rho", Mj)
        v = f.createVariable("temp_NudgeCoef", "d",
                             ("eta_rho", "xi_rho"))
        v.units = "day-1"
        v[:] = np.full((Mj, Li), 2.0)        # 2/day
        f.flush()
        f.close()
        out = load_nudgcoef_netcdf(path, cfg)
    np.testing.assert_allclose(np.asarray(out["Tnudgcof"]),
                               2.0 / 86400.0, rtol=1e-12)


# ---------------------------------------------------------------------------
# tide files
# ---------------------------------------------------------------------------

def test_tide_file_roundtrip_and_ellipse():
    from roms_tpu.core.tides import make_tidal_obc_fn
    from roms_tpu.io.tide_nc import load_tide_netcdf, write_tide_netcdf
    cfg = small_cfg()
    Mj, Li = cfg.shape2d
    T_M2 = 12.4206012
    amp, ph = 0.5, 30.0
    cmax, cmin, cang, cph = 0.3, 0.1, 40.0, 25.0
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "tides.nc")
        write_tide_netcdf(path, cfg, period_hours=[T_M2],
                          Eamp=amp, Ephase_deg=ph, Cmax=cmax, Cmin=cmin,
                          Cangle_deg=cang, Cphase_deg=cph)
        tf = load_tide_netcdf(path, cfg, edges=("west",))

    assert float(tf.period[0]) == pytest.approx(T_M2 * 3600.0)
    obc_fn = make_tidal_obc_fn(tf)
    t = 5000.0
    omega = 2 * np.pi / (T_M2 * 3600.0)
    data = obc_fn(t)
    want_z = amp * np.cos(omega * t - np.deg2rad(ph))
    np.testing.assert_allclose(np.asarray(data["zeta"]["west"]),
                               want_z, rtol=1e-6)
    # ellipse synthesis: u = Cmax cosA cos(wt-P) - Cmin sinA sin(wt-P)
    A, P = np.deg2rad(cang), np.deg2rad(cph)
    th = omega * t - P
    want_u = cmax * np.cos(A) * np.cos(th) - cmin * np.sin(A) * np.sin(th)
    want_v = cmax * np.sin(A) * np.cos(th) + cmin * np.cos(A) * np.sin(th)
    np.testing.assert_allclose(np.asarray(data["ubar"]["west"]), want_u,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(data["vbar"]["west"]), want_v,
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# deck-driven file run (custom app, no analytic functional)
# ---------------------------------------------------------------------------

def test_deck_driven_custom_file_app(capsys):
    from roms_tpu.__main__ import main
    from roms_tpu.io.grid_nc import write_grid_netcdf
    cfg = _clamped_west_cfg()
    grid = upwelling.make_grid(cfg)
    Mj, _ = cfg.shape2d
    N = cfg.N
    times = np.array([0.0, 3600.0])
    zeta_w = np.zeros((2, Mj))
    temp_w = 12.0 * np.ones((2, N, Mj))

    with tempfile.TemporaryDirectory() as d:
        gpath = os.path.join(d, "grid.nc")
        bpath = os.path.join(d, "bry.nc")
        write_grid_netcdf(gpath, cfg, grid)
        _write_bry(bpath, cfg, times, zeta_w, temp_w)
        deck = os.path.join(d, "roms_custom.in")
        with open(deck, "w") as fh:
            fh.write(f"""
TITLE = custom file-based bay
MyAppCPP == MY_BAY
Lm == {cfg.Lm}
Mm == {cfg.Mm}
N == {cfg.N}
NTIMES == 2
DT == 60.0d0
NDTFAST == 10
NRREC == 0
LBC(isFsur) == Cla Clo Clo Clo
LBC(isUbar) == Clo Clo Clo Clo
LBC(isVbar) == Clo Clo Clo Clo
LBC(isUvel) == Clo Clo Clo Clo
LBC(isVvel) == Clo Clo Clo Clo
LBC(isTvar) == Cla Clo Clo Clo \\
               Cla Clo Clo Clo
GRDNAME == {gpath}
BRYNAME == {bpath}
NHIS == 0
NRST == 0
NINFO == 0
""")
        rc = main([deck, "--outdir", d])
    assert rc == 0
    out = capsys.readouterr().out
    assert "grid from file" in out
    assert "boundary data from" in out
