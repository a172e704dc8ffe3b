"""CANYON / OVERFLOW / LAKE_SIGNELL / ESTUARY_TEST / RIVERPLUME1
analytical applications (reference ana_grid.h / ana_initial.h /
ana_smflux.h / ana_m2obc.h / ana_psource.h setups).

Each app pins one defining physical behavior at reduced resolution."""

import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.core.stepping import Model
from roms_tpu.functionals import idealized as ia


def _finite(s):
    return (np.isfinite(np.asarray(s.zeta)).all()
            and np.isfinite(np.asarray(s.t)).all())


@pytest.mark.quick
def test_canyon_stratified_rest():
    """Resting stratification over the canyon: pressure-gradient error
    currents stay small (the canyon is a prsgrd acid test like
    SEAMOUNT, ana_grid.h:946-953)."""
    cfg = ia.canyon_config(Lm=32, Mm=24, N=8)
    g = ia.canyon_grid(cfg)
    m = Model(cfg, g, ia.zero_forcing(cfg))
    s = m.run(ia.canyon_initial(cfg, g), 10)
    assert _finite(s)
    assert np.abs(np.asarray(s.u)).max() < 0.05


def test_overflow_downslope_current():
    """The dense pool accelerates toward the deep end and temperature
    stays monotone-bounded (ice-cold [0, T0] range preserved by the
    limited isopycnal rotation)."""
    cfg = ia.overflow_config(Lm=4, Mm=64, N=10)
    g = ia.overflow_grid(cfg)
    m = Model(cfg, g, ia.zero_forcing(cfg))
    s = m.run(ia.overflow_initial(cfg, g), 40)
    assert _finite(s)
    t = np.asarray(s.t[0])
    assert t.min() > -1e-6 and t.max() < 5.0 + 1e-6
    # downslope (positive-y) flow develops at the front
    assert np.asarray(s.v).max() > 0.05


def test_lake_signell_wind_setup():
    """No motion before the hour-15 wind ramp; after it, the free
    surface tilts up at the downwind (east) end
    (ana_smflux.h:219-231)."""
    cfg = ia.lake_signell_config(Lm=50, Mm=10, N=6, dt=120.0)
    g = ia.lake_signell_grid(cfg)
    m = Model(cfg, g, ia.lake_signell_forcing_fn(cfg, g))
    s0 = ia.lake_signell_initial(cfg, g)
    s = m.run(s0, 10)                      # t = 20 min << 15 h
    assert np.abs(np.asarray(s.zeta)).max() < 1e-4
    import dataclasses
    s = dataclasses.replace(s) if False else s
    s = s._replace(time=np.float64(20.0 * 3600.0))  # jump past the ramp
    s = m.run(s, 30)
    assert _finite(s)
    z = np.asarray(s.zeta)
    west = z[1:-1, 1:6].mean()
    east = z[1:-1, -6:-1].mean()
    assert east > west + 1e-4, (west, east)


def test_estuary_tide_and_salt():
    """M2 tide enters through the mouth; salinity stays within the
    [river 0, ocean 30] bounds (ana_fsobc.h:106-113)."""
    cfg = ia.estuary_config(Lm=60, Mm=3, N=8)
    g = ia.estuary_grid(cfg)
    m = Model(cfg, g, ia.zero_forcing(cfg),
              obc_fn=ia.estuary_obc_fn(cfg, g))
    s = m.run(ia.estuary_initial(cfg, g), 60)   # 30 min into the cycle
    assert _finite(s)
    z = np.asarray(s.zeta)
    # sin > 0 drives a clamped ebb flux at the mouth
    # (ana_m2obc.h:143 my_flux = -tid_flow*sin - riv_flow): the
    # water level near the mouth drops but stays tidal-amplitude bounded
    assert z[1:-1, 1:10].mean() < -1e-3
    assert np.abs(z).max() < 0.5
    # U3 advection (deck Hadvection) is dispersive: allow the small
    # overshoot it produces at the salt front
    salt = np.asarray(s.t[1])
    assert salt.min() > -0.05 and salt.max() < 30.05


def test_riverplume_freshens_mouth():
    """The 1500 m3/s river source freshens the cell east of the
    western-wall channel face (ana_psource.h:156-161,347)."""
    cfg = ia.riverplume_config(Lm=20, Mm=34, N=8)
    g = ia.riverplume_grid(cfg)
    src = ia.riverplume_sources(cfg, g)
    m = Model(cfg, g, ia.zero_forcing(cfg), sources=src)
    s0 = ia.riverplume_initial(cfg, g)
    s = m.run(s0, 30)
    assert _finite(s)
    j_gap = cfg.Mm - 17
    salt = np.asarray(s.t[1])
    # receiving cell and its neighborhood freshen from 32
    assert salt[:, j_gap, 2:5].min() < 31.5
    # far field untouched
    assert abs(np.asarray(s.t[1])[:, 5, -3].mean() - 32.0) < 0.1


def test_windbasin_downwind_surface_return_bottom():
    """Homogeneous wind-driven basin: surface flow downwind (westward),
    compensating return flow at depth (windbasin.h)."""
    cfg = ia.windbasin_config(Lm=24, Mm=16, N=8)
    g = ia.windbasin_grid(cfg)
    m = Model(cfg, g, ia.windbasin_forcing_fn(cfg, g))
    s = m.run(ia.windbasin_initial(cfg, g), 40)
    assert _finite(s)
    u = np.asarray(s.u)[:, 6:10, 10:14].mean(axis=(1, 2))
    assert u[-1] < 0.0            # surface downwind (westward)
    assert u[0] > u[-1]           # sheared return toward the bottom


def test_lmd_test_wind_pulse_mixes():
    """KPP under the 16-h wind pulse cools the (warm-over-cold) surface
    by entrainment (lmd_test.h)."""
    cfg = ia.lmd_test_config(N=20, dt=600.0)
    g = ia.lmd_test_grid(cfg)
    m = Model(cfg, g, ia.lmd_test_forcing_fn(cfg, g))
    s0 = ia.lmd_test_initial(cfg, g)
    s = m.run(s0, 48)             # 8 hours into the pulse
    assert _finite(s)
    sst0 = float(np.asarray(s0.t[0])[-1, 5, 5])
    sst1 = float(np.asarray(s.t[0])[-1, 5, 5])
    assert sst1 < sst0 - 1e-3, (sst0, sst1)


def test_mixed_layer_gls_deepens():
    """GLS box: constant wind stirs the linearly stratified column —
    SST drops, near-surface stratification weakens (mixed_layer.h)."""
    cfg = ia.mixed_layer_config(N=16)
    g = ia.mixed_layer_grid(cfg)
    m = Model(cfg, g, ia.mixed_layer_forcing_fn(cfg, g))
    s0 = ia.mixed_layer_initial(cfg, g)
    s = m.run(s0, 120)            # one hour
    assert _finite(s)
    T0 = np.asarray(s0.t[0])[:, 2, 2]
    T1 = np.asarray(s.t[0])[:, 2, 2]
    assert T1[-1] < T0[-1]                      # SST cooled
    assert (T1[-1] - T1[-3]) < (T0[-1] - T0[-3])  # weaker surface dT


def test_sed_toy_erosion():
    """1 m/s flume flow over an erodible bed suspends sediment
    (sed_toy.h ANA_SEDIMENT column)."""
    import jax.numpy as jnp
    from roms_tpu.core.sediment import (SedConfig, initial_sed,
                                        make_sed_hook)
    from roms_tpu.core.state import initial_state
    cfg = ia.sed_toy_config(N=10)
    g = ia.sed_toy_grid(cfg)
    sedc = SedConfig(nsed=1, Wsed=(0.1,), Erate=(5e-4,),
                     tau_ce=(5e-6,))
    s0 = ia.sed_toy_initial(cfg, g)
    s0 = initial_state(cfg, g, u=s0.u, t=s0.t,
                       sed=initial_sed(cfg, sedc, bed_mass0=10.0))
    m = Model(cfg, g, ia.zero_forcing(cfg),
              sed_fn=make_sed_hook(cfg, sedc, g))
    s = m.run(s0, 60)
    assert _finite(s)
    susp = float(np.asarray(s.t[2] * s.Hz)[:, 1:-1, 1:-1].sum())
    assert susp > 1e-6            # bed eroded into suspension
    bed = float(np.asarray(s.sed.bed_mass[0])[1:-1, 1:-1].mean())
    assert bed < 10.0


def test_bl_test_kpp_boundary_layers():
    """BL_TEST (bl_test.h): COARE bulk fluxes with the analytic
    atmosphere drive a northward surface current through full LMD-KPP
    (+bkpp +DDMIX); the east radiation boundary stays stable and the
    tanh stratification bounds hold."""
    cfg = ia.bl_test_config(Lm=19, Mm=4, N=16)
    g = ia.bl_test_grid(cfg)
    m = Model(cfg, g, ia.bl_test_forcing_fn(cfg, g))
    s0 = ia.bl_test_initial(cfg, g)
    s = m.run(s0, 30)
    assert _finite(s)
    v = np.asarray(s.v)
    # 10 m/s northward wind: surface v exceeds deeper v in magnitude
    assert v[-1, :, 5:-2].max() > 0.005
    assert v[-1].max() > np.abs(v[0]).max()
    T = np.asarray(s.t[0])
    assert T.min() > cfg.eos.T0 - 6.26 - 0.5
    assert T.max() < cfg.eos.T0 + 6.26 + 0.5


def test_flt_test_island_wake_and_floats():
    """FLT_TEST (flt_test.h): body-force wind over an EW-periodic
    channel with a center island; masked cells stay at rest and floats
    seeded upstream advect eastward around the island."""
    from roms_tpu.core.floats import Floats, step_floats
    cfg = ia.flt_test_config()
    g = ia.flt_test_grid(cfg)
    m = Model(cfg, g, ia.flt_test_forcing_fn(cfg, g))
    s = m.run(ia.flt_test_initial(cfg, g), 40)
    assert _finite(s)
    u = np.asarray(s.u)
    umask = np.asarray(g.umask)
    assert np.abs(u * (1.0 - umask)[None]).max() < 1e-12  # walls at rest
    # interior eastward flow develops away from the wall rows
    assert (u[:, 3:-3, :] * umask[None, 3:-3, :]).max() > 0.05
    # floats: seed upstream of the island at mid depth (mid-channel
    # latitudes; the wall-adjacent lanes hold a westward wake
    # recirculation that wraps through the periodic boundary)
    flt = Floats(x=jnp.asarray([4.0, 4.0]),
                 y=jnp.asarray([6.5, 9.0]),
                 s=jnp.asarray([-0.5, -0.5]),
                 bounded=jnp.asarray([True, True]))
    W = jnp.zeros_like(s.z_w)
    for _ in range(20):
        flt = step_floats(cfg, g, flt, s.u, s.v, W, s.Hz, g.sc_r)
    assert bool(np.all(np.asarray(flt.bounded)))
    # the open-lane float advects clearly eastward; the float aimed at
    # the island stagnates and diverts laterally around it
    assert float(flt.x[1]) > 6.0
    assert abs(float(flt.y[0]) - 6.5) > 0.3


def test_shoreface_surf_zone():
    """SHOREFACE (shoreface.h): shoreward waves break over the planar
    beach; the WEC vortex force + Lagrangian Stokes transport set up a
    shoreward surface setup with an offshore return flow (undertow),
    the shoreline row stays dry (wet/dry), and the wave-driven
    bottom stress suspends sand from the erodible bed."""
    cfg = ia.shoreface_config(N=10)
    g = ia.shoreface_grid(cfg)
    extras = ia.shoreface_extras(cfg, g)
    m = Model(cfg, g, ia.zero_forcing(cfg), **extras)
    s0 = ia.shoreface_initial(cfg, g)
    s = m.run(s0, 120)                    # 10 min of surf
    assert _finite(s)
    zeta = np.asarray(s.zeta)
    h = np.asarray(g.h)
    # wave setup: mean surface higher in the surf zone (shallow, east)
    # than offshore (west) along the wet columns
    # genuinely wet columns: clamped dry cells sit at depth ~= Dcrit
    # (to roundoff), so use a margin to find the true surf zone
    wet = (h + zeta) > 2.0 * cfg.Dcrit
    j = cfg.Mm // 2 + 1
    wet_i = np.where(wet[j])[0]
    assert zeta[j, wet_i[-3]] > zeta[j, wet_i[2]]
    # undertow: depth-integrated Eulerian return flow offshore
    # (negative u) compensating the onshore Stokes transport
    u = np.asarray(s.u)
    assert u[:, j, wet_i[-8]:wet_i[-3]].min() < -1e-3
    # the beach crest (h < 0) stays dry: no flow there
    dry_i = np.where(h[j] < -0.5)[0]
    if dry_i.size:
        assert np.abs(u[:, j, dry_i]).max() < 1e-8
    # sand suspended in the surf zone, bed loses mass there
    sand = np.asarray(s.t[2])
    assert sand[:, j, wet_i[-6]:wet_i[-1]].max() > 1e-8
    bed = np.asarray(s.sed.bed_mass[0])
    assert bed[j, wet_i[-5]:wet_i[-1]].min() < 2650.0 * 0.5 * 5.0


def test_channel_geostrophic_jet_stable():
    """CHANNEL (channel.h): the geostrophically balanced Gaussian jet
    must stay near balance — kinetic energy within a few percent over
    an inertial period."""
    cfg = ia.channel_config(Lm=48, Mm=36, N=5, dt=300.0)
    g = ia.channel_grid(cfg)
    s0 = ia.channel_initial(cfg, g)
    m = Model(cfg, g, ia.channel_forcing_fn(cfg, g))
    ke0 = float(np.sum(np.asarray(s0.u) ** 2))
    s = m.run(s0, 40)
    assert np.isfinite(np.asarray(s.zeta)).all()
    ke = float(np.sum(np.asarray(s.u) ** 2))
    assert abs(ke - ke0) / ke0 < 0.1, (ke, ke0)
    # jet profile retains its Gaussian peak at mid-channel
    uprof = np.asarray(s.u[-1]).mean(axis=1)
    assert uprof.argmax() in range(len(uprof) // 3,
                                   2 * len(uprof) // 3 + 1)


def test_test_chan_head_driven_flow():
    """TEST_CHAN (test_chan.h): the east-side head drawdown drives a
    down-gradient (eastward) mean flow."""
    cfg = ia.test_chan_config(Lm=40, Mm=4, N=6)
    g = ia.test_chan_grid(cfg)
    m = Model(cfg, g, ia.zero_forcing(cfg),
              obc_fn=ia.test_chan_obc_fn(cfg, g))
    s = m.run(ia.test_chan_initial(cfg, g), 120)
    ub = np.asarray(s.ubar)[1:-1, 2:-2]
    assert np.isfinite(ub).all()
    assert ub.mean() > 0.005, ub.mean()      # eastward (downhill)


def test_sed_test1_suspends_sand():
    """SED_TEST1 (sed_test1.h): the ~1 m/s head-driven flume flow must
    erode the bed and suspend sand into the water column."""
    cfg = ia.sed_test1_config(Lm=40, Mm=4, N=8)
    g = ia.sed_test1_grid(cfg)
    m = Model(cfg, g, ia.zero_forcing(cfg),
              **ia.sed_test1_extras(cfg, g))
    s = m.run(ia.sed_test1_initial(cfg, g), 300)
    assert np.isfinite(np.asarray(s.t)).all()
    # eastern head is higher -> westward flume flow
    ub = np.asarray(s.ubar)[1:-1, 2:-2]
    assert ub.mean() < -0.005, ub.mean()
    sand = np.asarray(s.t[2])
    assert sand.max() > 1e-6, sand.max()
    # concentration decreases upward (settling balance)
    prof = sand[:, 2, 5:-5].mean(axis=1)
    assert prof[0] > prof[-1]


def test_riverplume2_kpp_plume():
    """RIVERPLUME2 (riverplume2.h): LMD-KPP variant of the plume —
    freshens at the mouth like RIVERPLUME1."""
    cfg = ia.riverplume2_config(Lm=20, Mm=30, N=6)
    g = ia.riverplume2_grid(cfg)
    m = Model(cfg, g, ia.zero_forcing(cfg),
              **ia.riverplume2_extras(cfg, g))
    s = m.run(ia.riverplume2_initial(cfg, g), 60)
    assert np.isfinite(np.asarray(s.t)).all()
    S = np.asarray(s.t[1])
    # salinity at the river mouth freshens from ambient 32
    j_gap = cfg.Mm - 17
    assert S[:, j_gap, 2:6].min() < 31.8, S[:, j_gap, 2:6].min()


def test_lab_canyon_polar_grid_stable():
    """LAB_CANYON (lab_canyon.h): rotating polar annulus with canyon
    bathymetry — curvilinear metrics must integrate stably from rest
    (no spurious currents above lab scale)."""
    cfg = ia.lab_canyon_config(Lm=24, Mm=36, N=5)
    g = ia.lab_canyon_grid(cfg)
    m = Model(cfg, g, ia.zero_forcing(cfg))
    s = m.run(ia.lab_canyon_initial(cfg, g), 100)
    assert np.isfinite(np.asarray(s.zeta)).all()
    # homogeneous fluid at rest in a rotating frame stays at rest
    assert np.abs(np.asarray(s.u)).max() < 1e-6
