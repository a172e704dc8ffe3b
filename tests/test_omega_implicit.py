"""OMEGA_IMPLICIT adaptive implicit vertical advection (omega.F:184-345
+ step3d_t.F/step3d_uv.F tridiagonal solves)."""

import numpy as np

from roms_tpu.core import omega as omega_mod
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


def test_partition_identity_and_courant():
    """We + Wi == W exactly, and the explicit part's vertical Courant
    number stays below amax=0.75 wherever the limiter engaged."""
    cfg = upwelling.make_config(dtype="float64").replace(
        omega_implicit=True, dt=20000.0)       # huge dt -> Wi active
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    from roms_tpu.grid.depth import set_depth
    z_r, z_w, Hz = set_depth(grid, s0.zeta)
    # synthetic mass fluxes strong enough to drive vertical velocity
    rng = np.random.default_rng(0)
    Huon = np.asarray(0.05 * Hz) * rng.standard_normal(np.asarray(Hz).shape)
    Hvom = np.asarray(0.05 * Hz) * rng.standard_normal(np.asarray(Hz).shape)
    W = np.asarray(omega_mod.omega(cfg, grid, Huon, Hvom, z_w))
    We, Wi = omega_mod.omega_split(cfg, grid, Huon, Hvom, z_w)
    We, Wi = np.asarray(We), np.asarray(Wi)
    assert np.allclose(We + Wi, W, atol=1e-12)
    assert np.abs(Wi).max() > 0.0              # limiter engaged
    # explicit Courant: |We|*dt*pm*pn / dz <= amax in the interior
    dz = np.asarray(z_w[1:] - z_w[:-1])
    pmn = np.asarray(grid.pm * grid.pn)
    cu = np.abs(We[1:-1]) * cfg.dt * pmn[None] / \
        np.minimum(dz[:-1], dz[1:])
    assert cu[:, 1:-1, 1:-1].max() <= 0.75 + 1e-9, cu.max()


def test_degenerates_to_explicit_when_courant_small():
    """With weak vertical velocities the implicit path must reproduce
    the explicit integration to roundoff."""
    cfg = upwelling.make_config(dtype="float64")
    grid = upwelling.make_grid(cfg)

    def run(oi):
        c = cfg.replace(omega_implicit=oi)
        m = Model(c, grid, upwelling.make_forcing_fn(c, grid),
                  vmix_fn=upwelling.make_vmix_fn(c))
        return m.run(upwelling.make_initial(c, grid), 20)

    a, b = run(True), run(False)
    assert np.abs(np.asarray(a.u) - np.asarray(b.u)).max() < 1e-12
    assert np.abs(np.asarray(a.t) - np.asarray(b.t)).max() < 1e-10


def test_implicit_solve_stable_at_large_courant():
    """The point of the scheme: the upwind backward-Euler solve stays
    bounded and monotone at vertical Courant numbers where explicit
    upwind advection diverges.  Column test at Courant ~ 5."""
    import jax.numpy as jnp
    from roms_tpu.ops.tridiag import implicit_adv_solve

    N, M, L = 24, 4, 4
    Hz = jnp.ones((N, M, L))
    q = jnp.zeros((N, M, L)).at[N // 2].set(1.0)     # unit spike
    FC = 5.0 * jnp.ones((N + 1, M, L))               # Courant 5 upward
    FC = FC.at[0].set(0.0).at[-1].set(0.0)

    # explicit upwind at the same Courant diverges within a few steps
    qe = q
    for _ in range(5):
        flux = FC[1:-1] * qe[:-1]
        z = jnp.zeros_like(flux[:1])
        f = jnp.concatenate([z, flux, z], axis=0)
        qe = qe - (f[1:] - f[:-1]) / Hz
    assert np.abs(np.asarray(qe)).max() > 10.0       # it really blows up

    # implicit solve: bounded, positive, mass-conserving per column
    qi = q
    for _ in range(5):
        qi = implicit_adv_solve(Hz, FC, qi * Hz)
        assert float(jnp.min(qi)) >= -1e-14
        assert float(jnp.max(qi)) <= 1.0 + 1e-12
    mass = np.asarray((qi * Hz).sum(axis=0))
    assert np.allclose(mass, 1.0, atol=1e-12)        # closed column
