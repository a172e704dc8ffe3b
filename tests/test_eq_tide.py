"""Equilibrium tide body force (TIDE_GENERATING_FORCES,
equilibrium_tide.F + prsgrd32.h:286)."""

import jax.numpy as jnp
import numpy as np

from roms_tpu.core import tides
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import benchmark


def _lonlat(cfg):
    dx, dy = 360.0 / cfg.Lm, 20.0 / cfg.Mm
    Mj, Li = cfg.shape2d
    i = np.arange(1, Li + 1)
    j = np.arange(1, Mj + 1)
    lon = (dx * (i - 0.5))[None, :] + np.zeros((Mj, 1))
    lat = (-70.0 + dy * (j - 0.5))[:, None] + np.zeros((1, Li))
    return jnp.asarray(lon), jnp.asarray(lat)


class TestEquilibriumTide:
    def test_synthesis_amplitude_and_period(self):
        """Amplitude bounded by the sum of constituent Afl products;
        the dominant M2 signal nearly repeats after one M2 period."""
        lon = jnp.linspace(0.0, 360.0, 64)[None, :] * jnp.ones((8, 1))
        lat = jnp.zeros((8, 1)) + jnp.linspace(-10, 10, 8)[:, None]
        fn = tides.make_eq_tide_fn(lon, lat)
        e0 = np.asarray(fn(0.0))
        assert np.abs(e0).max() < 0.8          # sum of Afl ~ 0.48 m
        assert np.abs(e0).max() > 0.05         # equator: cos^2 ~ 1
        # quarter M2 period changes the field substantially
        TM2 = 2.0 * np.pi / 1.405189e-4
        e4 = np.asarray(fn(TM2 / 4.0))
        assert np.abs(e4 - e0).max() > 0.05

    def test_equator_semidiurnal_poles_weak(self):
        """cos^2(lat) structure: semidiurnal signal vanishes at the
        poles, sin(2*lat) diurnal vanishes at the equator and poles."""
        lon = jnp.zeros((3, 1))
        lat = jnp.asarray([[0.0], [45.0], [89.9]])
        fn = tides.make_eq_tide_fn(lon, lat)
        TM2 = 2.0 * np.pi / 1.405189e-4
        ts = np.linspace(0, TM2, 30)
        sig = np.stack([np.asarray(fn(t)) for t in ts])
        rng = sig.max(axis=0) - sig.min(axis=0)
        assert rng[2, 0] < 0.3 * rng[0, 0]     # near-pole much weaker

    def test_body_force_drives_tide(self):
        """With the body force on, a resting ocean develops a tidal
        elevation response; without it, it stays at rest."""
        cfg = benchmark.make_config(Lm=64, Mm=32, N=8, dtype="float64")
        grid = benchmark.make_grid(cfg)
        s0 = benchmark.make_initial(cfg, grid)
        lon, lat = _lonlat(cfg)

        def quiet_forcing(cfg_):
            import jax.numpy as j
            from roms_tpu.core.state import Forcing
            z2 = j.zeros(cfg_.shape2d)

            zt = j.zeros((cfg_.NT,) + cfg_.shape2d)

            def fn(t):
                return Forcing(sustr=z2, svstr=z2, stflx=zt, btflx=zt,
                               srflx=z2)
            return fn

        def run(eq):
            m = Model(cfg, grid, quiet_forcing(cfg),
                      eq_tide_fn=tides.make_eq_tide_fn(lon, lat)
                      if eq else None)
            return m.run(s0, 20)

        z_on = np.abs(np.asarray(run(True).zeta)).max()
        z_off = np.abs(np.asarray(run(False).zeta)).max()
        assert z_on > 10.0 * max(z_off, 1e-12), (z_on, z_off)
        assert np.isfinite(z_on)


def test_atm_press_inverse_barometer():
    """ATM_PRESS (prsgrd32.h:241-281): a horizontal sea-level-pressure
    gradient drives flow toward low pressure; uniform pressure is a
    no-op."""
    import dataclasses
    from roms_tpu.functionals import upwelling
    cfg = upwelling.make_config(dtype="float64")
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    Mj, Li = cfg.shape2d
    import jax.numpy as j
    import numpy as np

    def run(pair):
        m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  vmix_fn=upwelling.make_vmix_fn(cfg),
                  pair_fn=(lambda t: pair) if pair is not None
                  else None)
        return m.run(s0, 15)

    s_none = run(None)
    s_unif = run(j.full((Mj, Li), 1023.25))
    # uniform anomaly: no gradient -> identical dynamics
    assert np.abs(np.asarray(s_unif.u) - np.asarray(s_none.u)).max() \
        < 1e-12
    # low pressure in the north -> southward pressure force reversed:
    # response differs from the unforced run
    y = j.linspace(0.0, 1.0, Mj)[:, None] * j.ones((1, Li))
    s_grad = run(1013.25 - 10.0 * y)
    dv = np.abs(np.asarray(s_grad.v) - np.asarray(s_none.v)).max()
    assert dv > 1e-4, dv
    assert np.isfinite(np.asarray(s_grad.v)).all()


def test_scalar_sal_weakens_restoring_force():
    """Scalar SAL (zeta_SAL = beta*zeta): the barotropic restoring
    force scales by (1-beta), so the initial acceleration from a free-
    surface bump is reduced by exactly that factor."""
    import numpy as np
    import jax.numpy as jnp
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import upwelling

    def accel(beta):
        cfg = upwelling.make_config(Lm=16, Mm=16, N=4,
                                    dtype="float64").replace(
            sal_scalar=beta)
        grid = upwelling.make_grid(cfg)
        s0 = upwelling.make_initial(cfg, grid)
        Mj, Li = cfg.shape2d
        x = np.arange(Li)
        bump = 0.1 * np.exp(-((x - Li / 2.0) ** 2) / 8.0)
        zeta = jnp.asarray(np.broadcast_to(bump[None, :], (Mj, Li)))
        s0 = s0._replace(zeta=zeta)
        m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  vmix_fn=upwelling.make_vmix_fn(cfg))
        s1 = m.step(s0)
        return float(np.abs(np.asarray(s1.ubar)).max())

    a0 = accel(0.0)
    a1 = accel(0.1)
    assert a0 > 0.0
    assert a1 < a0
    assert abs(a1 / a0 - 0.9) < 0.08, (a0, a1)
