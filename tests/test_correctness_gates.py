"""Independent correctness gates standing in for the Fortran
cross-validation run (VERDICT round-3 item 5; gfortran is unavailable
in this environment — BASELINE.md documents the substitute table).

  1. cross-engine gate: the FULL BENCHMARK physics stepped with every
     Pallas kernel (interpret mode) vs the pure-jnp engine — one
     discretization, two independent implementations;
  2. published-solution gate: GRAV_ADJ gravity-current front speed vs
     the lock-exchange scaling 0.5*sqrt(g' H);
  3. grid-convergence gate: UPSTREAM3 / CENTERED4 horizontal advection
     truncation error converges at the schemes' design order.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from roms_tpu.core import stepping
from roms_tpu.functionals import benchmark, idealized


ALL_KERNELS = ("FLUX", "HMIX", "KPP", "PRSGRD", "RHO", "RHS3D",
               "TADV", "UV", "UVMIX", "VDIFF")


@pytest.mark.quick
class TestCrossEngineFullPhysics:
    """f64 interpret-mode Pallas vs jnp over full baroclinic steps of
    the BENCHMARK physics — every kernel at once (the round-3 gate
    covered step2d only)."""

    def _run(self, monkeypatch, kernels_on: bool, nsteps=2):
        for k in ALL_KERNELS:
            monkeypatch.setenv(f"ROMS_TPU_PALLAS_{k}",
                               "1" if kernels_on else "0")
            monkeypatch.setenv(f"ROMS_TPU_PALLAS_{k}_INTERPRET", "1")
        monkeypatch.setenv("ROMS_TPU_PALLAS_KPP_INTERPRET", "1")
        monkeypatch.setenv("ROMS_TPU_PALLAS_STEP2D", "0")
        cfg = benchmark.make_config(Lm=32, Mm=16, N=6,
                                    dtype="float64",
                                    full_physics=True)
        grid = benchmark.make_grid(cfg)
        s = benchmark.make_initial(cfg, grid)
        m = stepping.Model(
            cfg, grid,
            forcing_fn=benchmark.make_bulk_forcing_fn(cfg, grid))
        for _ in range(nsteps):
            s = m.step(s)
        return s

    def test_all_kernels_match_jnp_trajectory(self, monkeypatch):
        a = self._run(monkeypatch, False)
        b = self._run(monkeypatch, True)
        for f in ("zeta", "ubar", "vbar", "u", "v", "t"):
            x = np.asarray(getattr(a, f))
            y = np.asarray(getattr(b, f))
            assert np.isfinite(y).all(), f
            scale = np.abs(x).max() + 1e-30
            # relative gate with an f64 reassociation floor (the
            # early-spin-up fields are O(1e-9); interpret-mode
            # reductions reassociate)
            assert np.abs(y - x).max() < 1e-10 * scale + 5e-14, \
                (f, np.abs(y - x).max(), scale)


@pytest.mark.slow
def test_grav_adj_front_speed():
    """Lock-exchange gravity current: the front advances at
    c = alpha * sqrt(g' H) with alpha ~ 0.45-0.5 (Benjamin 1968 gives
    0.5 for an energy-conserving hydrostatic current; ROMS GRAV_ADJ
    historically measures slightly below).  Gate: 0.35 < alpha < 0.6."""
    cfg = idealized.grav_adj_config(Lm=128, Mm=4, N=20, dt=60.0,
                                    ndtfast=30)
    grid = idealized.grav_adj_grid(cfg)
    s = idealized.grav_adj_initial(cfg, grid)
    model = stepping.Model(
        cfg, grid, forcing_fn=idealized.zero_forcing(cfg))

    T_hi = float(np.asarray(s.t[0]).max())
    T_lo = float(np.asarray(s.t[0]).min())
    H = float(np.asarray(grid.h).max())
    gprime = cfg.g * cfg.eos.Tcoef * (T_hi - T_lo)
    c_theory = 0.5 * np.sqrt(gprime * H)
    Tmid = 0.5 * (T_hi + T_lo)
    dx = 1.0 / float(np.asarray(grid.pm)[2, 2])

    def front_x(state):
        # warm water is WEST (ana_initial.h:672-686): the dense bottom
        # current intrudes WESTWARD — track the leftmost bottom column
        # colder than the midpoint
        tb = np.asarray(state.t[0][0, 2, 1:-1])
        cold = np.where(tb < Tmid)[0]
        return (cold.min() + 1) * dx if cold.size else np.inf

    nsteps = 200
    s = model.run(s, nsteps)
    x1 = front_x(s)
    nsteps2 = 200
    s = model.run(s, nsteps2)
    x2 = front_x(s)
    # westward intrusion speed over the second window
    speed = (x1 - x2) / (nsteps2 * cfg.dt)
    alpha = speed / np.sqrt(gprime * H)
    assert 0.35 < alpha < 0.60, (alpha, speed, c_theory)


@pytest.mark.quick
class TestAdvectionConvergenceOrder:
    """Semi-discrete truncation error of the horizontal tracer flux
    divergence for a smooth periodic profile under uniform transport:
    halving dx must cut the error by ~2^p (UPSTREAM3 p=3,
    CENTERED4 p=4; step3d_t.F:432-700 scheme dispatch)."""

    def _residual(self, scheme, Lm):
        from roms_tpu.core import advection
        from roms_tpu.functionals import upwelling
        cfg = upwelling.make_config(Lm=Lm, Mm=4, N=1,
                                    dtype="float64")
        cfg = cfg.replace(hadv=scheme)
        Mj, Li = cfg.shape2d
        # torus coordinate over the Lm interior columns
        x = (jnp.arange(Li) - 0.5) / Lm * 2.0 * np.pi
        q = jnp.broadcast_to(jnp.sin(x), (1, Mj, Li))
        dx = 1.0
        u0 = 1.0
        Huon = jnp.full((1, Mj, Li), u0 * dx)   # unit-depth transport
        Hvom = jnp.zeros((1, Mj, Li))
        from roms_tpu.functionals import upwelling as _up
        grid = _up.make_grid(cfg)
        from roms_tpu.ops import stencil as st
        q = st.periodic_x(q)
        FX, FE = advection.hadv_flux(cfg, grid, q, Huon, Hvom, scheme)
        # d(FX)/dx at rho points vs exact u*dq/dx
        div = (st.ip1(FX) - FX) / dx
        k = 2.0 * np.pi / Lm
        exact = u0 * k * jnp.cos(x)[None, None, :]
        r = np.asarray(div - exact)[0, 2, 2:-2]
        return np.abs(r).max()

    @pytest.mark.parametrize("scheme,order", [("upstream3", 3),
                                              ("centered4", 4)])
    def test_order(self, scheme, order):
        e1 = self._residual(scheme, 32)
        e2 = self._residual(scheme, 64)
        p = np.log2(e1 / e2)
        assert p > order - 0.4, (scheme, e1, e2, p)
