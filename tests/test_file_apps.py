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


# ---------------------------------------------------------------------------
# Round-5: multi-grid data-driven decks end-to-end (VERDICT item 5)
# ---------------------------------------------------------------------------

def _write_ini(path, cfg, zeta=None):
    """Minimal INI-layout NetCDF (ocean_time + zeta)."""
    from scipy.io import netcdf_file
    Mj, Li = cfg.shape2d
    f = netcdf_file(path, "w", version=2)
    f.createDimension("ocean_time", None)
    f.createDimension("xi_rho", Li)
    f.createDimension("eta_rho", Mj)
    tv = f.createVariable("ocean_time", "d", ("ocean_time",))
    zv = f.createVariable("zeta", "d", ("ocean_time", "eta_rho",
                                        "xi_rho"))
    tv[0] = 0.0
    zv[0] = np.zeros((Mj, Li)) if zeta is None else np.asarray(zeta)
    f.flush()
    f.close()


def test_dogbone_composite_deck_end_to_end(tmp_path):
    """DOGBONE-class composite run driven ENTIRELY through the deck:
    generated grid NetCDFs + NGCNAME contact file
    (io.contact_nc.write_contact_netcdf) -> python -m roms_tpu ->
    contact exchange moves a free-surface anomaly from the left grid
    into the right grid (dogbone.h; roms_dogbone_composite.in;
    set_contact.F)."""
    import subprocess
    import sys

    from roms_tpu.core.nesting import ContactRegion
    from roms_tpu.functionals import idealized
    from roms_tpu.grid.grid import build_grid
    from roms_tpu.io.contact_nc import write_contact_netcdf
    from roms_tpu.io.grid_nc import write_grid_netcdf

    Lm, Mm, N = 21, 15, 6
    off = 15                      # right grid global column offset
    cfg = idealized.dogbone_config(Lm=Lm, Mm=Mm, N=N)

    def half_grid(path, masked_side):
        Mj, Li = cfg.shape2d
        h = np.full((Mj, Li), 10.0)
        pm = np.full((Mj, Li), 1.0 / 500.0)
        rmask = np.ones((Mj, Li))
        # the "bone": outside the central channel rows, the overlap
        # half of each grid is land
        cols = slice(12, Li) if masked_side == "east" else \
            slice(0, Li - 12)
        rmask[:5, cols] = 0.0
        rmask[-5:, cols] = 0.0
        g = build_grid(cfg, h=h, pm=pm, pn=pm.copy(),
                       f=np.zeros((Mj, Li)), rmask=rmask)
        write_grid_netcdf(path, cfg, g)
        return g

    g_l = half_grid(str(tmp_path / "grd_left.nc"), "east")
    g_r = half_grid(str(tmp_path / "grd_right.nc"), "west")

    # left grid: zeta bump in the channel just west of the overlap
    Mj, Li = cfg.shape2d
    jj, ii = np.mgrid[0:Mj, 0:Li]
    bump = 0.05 * np.exp(-((jj - 7.5) ** 2 + (ii - 10.0) ** 2) / 6.0)
    _write_ini(str(tmp_path / "ini_left.nc"), cfg, zeta=bump)
    _write_ini(str(tmp_path / "ini_right.nc"), cfg)

    regions = [
        ContactRegion(donor=1, receiver=0, edge="east", di=-off,
                      dj=0),
        ContactRegion(donor=0, receiver=1, edge="west", di=off,
                      dj=0),
    ]
    write_contact_netcdf(str(tmp_path / "ngc.nc"), Ngrids=2,
                         dims={0: (Lm, Mm), 1: (Lm, Mm)},
                         composite=regions)

    deck = tmp_path / "roms_dogbone.in"
    deck.write_text(f"""
       TITLE = Dogbone composite test (generated)
    MyAppCPP = DOGBONE
      Ngrids =  2
          Lm == {Lm} {Lm}
          Mm == {Mm} {Mm}
           N == {N} {N}
      NTIMES == 40 40
          DT == 6.0d0 6.0d0
     NDTFAST == 20 20
        NHIS == 20 20
       NINFO == 20
     GRDNAME == {tmp_path}/grd_left.nc \\
                {tmp_path}/grd_right.nc
     ININAME == {tmp_path}/ini_left.nc \\
                {tmp_path}/ini_right.nc
     NGCNAME =  {tmp_path}/ngc.nc
     HISNAME == dog_his_left.nc \\
                dog_his_right.nc
""")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-m", "roms_tpu", str(deck),
         "--outdir", str(tmp_path)],
        capture_output=True, text=True, timeout=900, env=env,
        cwd="/tmp")
    assert out.returncode == 0, out.stderr[-3000:]
    assert "multi-grid run: Ngrids=2" in out.stdout
    from scipy.io import netcdf_file
    fr = netcdf_file(str(tmp_path / "dog_his_right.nc"), "r",
                     mmap=False)
    zr = np.asarray(fr.variables["zeta"][-1])
    fr.close()
    # the anomaly crossed the contact into the right grid's interior
    # (sqrt(gH)~10 m/s, 240 s -> ~5 cells beyond the contact edge)
    assert np.isfinite(zr).all()
    assert np.abs(zr[1:-1, 2:8]).max() > 1e-4, np.abs(zr).max()


def test_refined_deck_end_to_end(tmp_path):
    """INLET_TEST-class refined two-grid deck (refinement contact in
    the NGCNAME file): the driver runs the two-way rf-substep cycle
    with correct_tracer refluxing."""
    import subprocess
    import sys

    from roms_tpu.core.nesting import RefineSpec
    from roms_tpu.functionals import idealized
    from roms_tpu.grid.grid import build_grid
    from roms_tpu.io.contact_nc import write_contact_netcdf
    from roms_tpu.io.grid_nc import write_grid_netcdf

    Lm_p, Mm_p, N = 24, 20, 4
    rf = 2
    spec = RefineSpec(i0=8, j0=6, rf=rf, Lm_c=12, Mm_c=12)
    cfg_p = idealized.dogbone_config(Lm=Lm_p, Mm=Mm_p, N=N)
    cfg_c = idealized.dogbone_config(Lm=spec.Lm_c, Mm=spec.Mm_c, N=N,
                                     dt=3.0)

    Mj, Li = cfg_p.shape2d
    h = np.full((Mj, Li), 10.0)
    pm = np.full((Mj, Li), 1.0 / 500.0)
    g_p = build_grid(cfg_p, h=h, pm=pm, pn=pm.copy(),
                     f=np.zeros((Mj, Li)))
    write_grid_netcdf(str(tmp_path / "grd_p.nc"), cfg_p, g_p)
    Mj_c, Li_c = cfg_c.shape2d
    h_c = np.full((Mj_c, Li_c), 10.0)
    pm_c = np.full((Mj_c, Li_c), rf / 500.0)
    g_c = build_grid(cfg_c, h=h_c, pm=pm_c, pn=pm_c.copy(),
                     f=np.zeros((Mj_c, Li_c)))
    write_grid_netcdf(str(tmp_path / "grd_c.nc"), cfg_c, g_c)

    jj, ii = np.mgrid[0:Mj, 0:Li]
    bump = 0.05 * np.exp(-((jj - 10.0) ** 2 + (ii - 12.0) ** 2) / 8.0)
    _write_ini(str(tmp_path / "ini_p.nc"), cfg_p, zeta=bump)
    _write_ini(str(tmp_path / "ini_c.nc"), cfg_c)

    write_contact_netcdf(str(tmp_path / "ngc.nc"), Ngrids=2,
                         dims={0: (Lm_p, Mm_p), 1: (spec.Lm_c,
                                                    spec.Mm_c)},
                         refine={(0, 1): spec})

    deck = tmp_path / "roms_refined.in"
    deck.write_text(f"""
       TITLE = Refined two-grid test (generated)
    MyAppCPP = DOGBONE
      Ngrids =  2
          Lm == {Lm_p} {spec.Lm_c}
          Mm == {Mm_p} {spec.Mm_c}
           N == {N} {N}
      NTIMES == 20 40
          DT == 6.0d0 3.0d0
     NDTFAST == 20 20
        NHIS == 10 10
     GRDNAME == {tmp_path}/grd_p.nc \\
                {tmp_path}/grd_c.nc
     ININAME == {tmp_path}/ini_p.nc \\
                {tmp_path}/ini_c.nc
     NGCNAME =  {tmp_path}/ngc.nc
     HISNAME == ref_his_p.nc \\
                ref_his_c.nc
""")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-m", "roms_tpu", str(deck),
         "--outdir", str(tmp_path)],
        capture_output=True, text=True, timeout=900, env=env,
        cwd="/tmp")
    assert out.returncode == 0, out.stderr[-3000:]
    assert "1 refinement pairs" in out.stdout
    from scipy.io import netcdf_file
    fc = netcdf_file(str(tmp_path / "ref_his_c.nc"), "r", mmap=False)
    zc = np.asarray(fc.variables["zeta"][-1])
    fc.close()
    assert np.isfinite(zc).all()
    # the parent's anomaly reached the child through the contact
    assert np.abs(zc[1:-1, 1:-1]).max() > 1e-4
