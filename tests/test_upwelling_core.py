"""End-to-end tests of the split-explicit 3D core on the UPWELLING case.

Mirrors the reference's test philosophy (SURVEY.md section 4): analytical
configs as golden tests, runtime invariants (volume/tracer conservation,
no blowup), and physical-regime checks instead of unit-testing each
Fortran loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


@pytest.fixture(scope="module")
def setup():
    cfg = upwelling.make_config(dtype="float64")
    grid = upwelling.make_grid(cfg)
    state = upwelling.make_initial(cfg, grid)
    model = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  upwelling.make_vmix_fn(cfg))
    return cfg, grid, state, model


@pytest.fixture(scope="module")
def state20(setup):
    cfg, grid, state, model = setup
    return model.run(state, 20)


class TestUpwellingCore:
    def test_finite_and_bounded(self, setup, state20):
        cfg, grid, state0, model = setup
        s = state20
        for name in ("zeta", "ubar", "vbar", "u", "v", "t"):
            a = np.asarray(getattr(s, name))
            assert np.isfinite(a).all(), name
        # velocities stay in a physical range for the wind-ramp regime
        assert np.abs(np.asarray(s.u)).max() < 1.0
        assert np.abs(np.asarray(s.zeta)).max() < 1.0
        # temperature stays within initial bounds (advection + diffusion
        # of a monotone profile cannot create new extrema)
        T0 = np.asarray(state0.t[0])
        T = np.asarray(s.t[0])[:, 1:-1, 1:-1]
        assert T.min() > T0.min() - 0.05
        assert T.max() < T0.max() + 0.05

    def test_volume_conservation(self, setup, state20):
        cfg, grid, state0, model = setup
        omn = np.asarray(1.0 / (grid.pm * grid.pn))[1:-1, 1:-1]
        vol = (np.asarray(state20.zeta)[1:-1, 1:-1] * omn).sum()
        # closed NS walls + EW periodic: net volume change is roundoff
        assert abs(vol) < 1e-6 * omn.sum() ** 0.5

    def test_salt_conservation(self, setup, state20):
        cfg, grid, state0, model = setup
        omn = np.asarray(1.0 / (grid.pm * grid.pn))
        def content(s):
            return float((np.asarray(s.t[1] * s.Hz)[:, 1:-1, 1:-1]
                          * omn[1:-1, 1:-1]).sum())
        c0, c1 = content(state0), content(state20)
        assert abs(c1 - c0) / abs(c0) < 1e-12

    def test_heat_conservation(self, setup, state20):
        # zero surface/bottom heat flux: total heat content conserved
        cfg, grid, state0, model = setup
        omn = np.asarray(1.0 / (grid.pm * grid.pn))
        def content(s):
            return float((np.asarray(s.t[0] * s.Hz)[:, 1:-1, 1:-1]
                          * omn[1:-1, 1:-1]).sum())
        c0, c1 = content(state0), content(state20)
        assert abs(c1 - c0) / abs(c0) < 1e-11

    def test_upwelling_regime(self, setup):
        """Equatorward wind on an f<0 channel drives westward flow and
        offshore/onshore cells; after a day the surface jet is westward."""
        cfg, grid, state, model = setup
        s = model.run(state, 288)
        u_surf = np.asarray(s.u[-1])[1:-1, 1:-1]
        assert u_surf.mean() < -0.01          # wind-driven westward jet
        # meridional overturning: v has both signs
        v = np.asarray(s.v)[:, 2:-1, 1:-1]
        assert v.min() < -1e-3 and v.max() > 1e-3

    def test_ew_periodicity_preserved(self, setup, state20):
        """Zonally uniform forcing + periodic BC: solution stays zonally
        uniform (exercises the periodic ring discipline of every kernel)."""
        cfg, grid, state0, model = setup
        s = state20
        for name in ("zeta", "ubar", "vbar"):
            a = np.asarray(getattr(s, name))[1:-1, 1:-1]
            spread = np.abs(a - a.mean(axis=-1, keepdims=True)).max()
            assert spread < 1e-10, (name, spread)
        u = np.asarray(s.u)[:, 1:-1, 1:-1]
        assert np.abs(u - u.mean(axis=-1, keepdims=True)).max() < 1e-10

    def test_restartable_pytree(self, setup, state20):
        """State round-trips through flatten/unflatten (checkpoint path)."""
        leaves, treedef = jax.tree_util.tree_flatten(state20)
        s2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert np.allclose(np.asarray(s2.u), np.asarray(state20.u))
