"""Tangent-linear / adjoint consistency via autodiff.

The reference hand-codes 276k lines of TLM/ADM/RPM kernels
(ROMS/Tangent, ROMS/Adjoint, ROMS/Representer) and validates them with
the inner-product symmetry driver (Drivers/pert_roms.h:9-28):
<A dx, dy> == <dx, A' dy> to roundoff.  Here the propagator A is
jax.jvp of the jitted step and A' is jax.vjp — the same discrete-adjoint
identity is checked directly, replacing the entire hand-coded stack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


@pytest.fixture(scope="module")
def setup():
    cfg = upwelling.make_config(Lm=12, Mm=14, N=6, dtype="float64")
    grid = upwelling.make_grid(cfg)
    state = upwelling.make_initial(cfg, grid)
    model = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  upwelling.make_vmix_fn(cfg))
    # move off the trivial initial state so the linearization is generic
    state = model.run(state, 3)
    return cfg, grid, state, model


def _dynamic_fields(s):
    return (s.zeta, s.ubar, s.vbar, s.u, s.v, s.t)


def _rand_like(key, s, scale=1e-4):
    leaves = _dynamic_fields(s)
    keys = jax.random.split(key, len(leaves))
    return tuple(scale * jax.random.normal(k, x.shape, x.dtype)
                 for k, x in zip(keys, leaves))


def _dot(a, b):
    return sum(jnp.vdot(x, y) for x, y in zip(a, b))


class TestAdjointConsistency:
    def test_dot_product_identity(self, setup):
        """<A dx, dy> == <dx, A^T dy> (pert_roms.h test)."""
        cfg, grid, state, model = setup

        def prop(fields):
            zeta, ubar, vbar, u, v, t = fields
            s = state._replace(zeta=zeta, ubar=ubar, vbar=vbar,
                               u=u, v=v, t=t)
            out = model.step_impl(s, grid)
            return _dynamic_fields(out)

        x0 = _dynamic_fields(state)
        dx = _rand_like(jax.random.PRNGKey(0), state, 1.0)
        dy = _rand_like(jax.random.PRNGKey(1), state, 1.0)

        _, Adx = jax.jvp(prop, (x0,), (dx,))
        _, vjp_fn = jax.vjp(prop, x0)
        ATdy, = vjp_fn(dy)

        lhs = float(_dot(Adx, dy))
        rhs = float(_dot(dx, ATdy))
        assert abs(lhs - rhs) <= 1e-10 * max(abs(lhs), abs(rhs))

    def test_tangent_linear_taylor(self, setup):
        """Taylor check (tlcheck_roms.h): |M(x+eps dx) - M(x) - eps A dx|
        converges at second order in eps."""
        cfg, grid, state, model = setup

        def prop(fields):
            zeta, ubar, vbar, u, v, t = fields
            s = state._replace(zeta=zeta, ubar=ubar, vbar=vbar,
                               u=u, v=v, t=t)
            out = model.step_impl(s, grid)
            return _dynamic_fields(out)

        x0 = _dynamic_fields(state)
        dx = _rand_like(jax.random.PRNGKey(2), state, 1.0)
        y0, Adx = jax.jvp(prop, (x0,), (dx,))

        errs = []
        for eps in (1e-4, 1e-5):
            xp = tuple(x + eps * d for x, d in zip(x0, dx))
            yp = prop(xp)
            err = np.sqrt(float(_dot(
                tuple(p - a - eps * b for p, a, b in zip(yp, y0, Adx)),
                tuple(p - a - eps * b for p, a, b in zip(yp, y0, Adx)))))
            errs.append(err)
        # one decade in eps -> ~two decades in error
        assert errs[1] < 0.05 * errs[0]

    def test_gradient_through_multistep(self, setup):
        """grad of a scalar cost through several steps is finite — the
        4D-Var building block."""
        cfg, grid, state, model = setup

        def cost(zeta0):
            s = state._replace(zeta=zeta0)
            for _ in range(3):
                s = model.step_impl(s, grid)
            return jnp.sum(s.zeta[1:-1, 1:-1] ** 2)

        gz = jax.grad(cost)(state.zeta)
        assert np.isfinite(np.asarray(gz)).all()
        assert float(jnp.max(jnp.abs(gz))) > 0.0
