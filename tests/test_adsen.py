"""Adjoint-sensitivity / optimal-observations drivers
(adsen_roms.h, optobs_roms.h)."""

import numpy as np
import pytest

import jax.numpy as jnp

from roms_tpu.assim.adsen import adjoint_sensitivity, optimal_observations
from roms_tpu.assim.i4dvar import Control
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


def setup():
    cfg = upwelling.make_config(Lm=8, Mm=8, N=4, dt=120.0, ndtfast=8,
                                dtype="float64")
    grid = upwelling.make_grid(cfg)
    model = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  upwelling.make_vmix_fn(cfg))
    x0 = upwelling.make_initial(cfg, grid)
    # J: mean upper-layer temperature in a small box (a space integral
    # of the state, the adsen_roms.h index form)
    def J(s):
        return jnp.mean(s.t[0, -1, 3:6, 3:6])
    return cfg, grid, model, x0, J


def test_adjoint_sensitivity_taylor():
    """dJ = <dJ/dx0, dx> to first order (single adjoint integration
    consistent with the nonlinear trajectory)."""
    cfg, grid, model, x0, J = setup()
    nsteps = 3
    val, grad = adjoint_sensitivity(model, grid, x0, nsteps, J)
    assert np.isfinite(float(val))
    rng = np.random.default_rng(3)
    dx = Control(
        zeta=jnp.zeros_like(x0.zeta),
        u=jnp.zeros_like(x0.u), v=jnp.zeros_like(x0.v),
        t=jnp.asarray(rng.standard_normal(x0.t.shape) * 0.01))
    from roms_tpu.assim.i4dvar import _add_control, _dot
    eps = 1.0e-3
    sp = _add_control(x0, Control(zeta=eps * dx.zeta, u=eps * dx.u,
                                  v=eps * dx.v, t=eps * dx.t))
    s = sp
    for _ in range(nsteps):
        s = model.step_impl(s, grid)
    J1 = float(J(s))
    lin = float(_dot(grad, dx)) * eps
    assert abs((J1 - float(val)) - lin) < 5e-3 * abs(lin) + 1e-14, \
        (J1 - float(val), lin)


def test_optimal_observations_localized():
    """The B-weighted sensitivity peaks at/near the index box and is
    negligible in the far corner (optobs_roms.h ranking)."""
    cfg, grid, model, x0, J = setup()
    sig = Control(zeta=jnp.zeros_like(x0.zeta) + 0.1,
                  u=jnp.zeros_like(x0.u) + 0.1,
                  v=jnp.zeros_like(x0.v) + 0.1,
                  t=jnp.zeros_like(x0.t) + 0.5)
    w = optimal_observations(model, grid, x0, 3, J, sig)
    f = np.abs(np.asarray(w.t[0, -1]))
    near = f[3:6, 3:6].max()
    # periodic in x: the far field in the non-periodic eta direction
    far = f[0:2, :].max()
    assert near > 10.0 * max(far, 1e-30), (near, far)
