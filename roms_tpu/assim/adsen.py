"""Adjoint-sensitivity and optimal-observations drivers.

The reference's ADM-driver family (ROMS/Drivers/adsen_roms.h,
optobs_roms.h) integrates the adjoint model once to obtain the
sensitivity of a scalar index J — space/time integrals of the state —
with respect to EVERY state variable at the initial time:

    dJ/dS = transpose(R) (dJ/dS_final)

Here transpose(R) is jax.vjp through the nonlinear trajectory (the
hand-written ad_* kernels of the reference do not exist in this
framework), so one `adjoint_sensitivity` call returns the full dJ/dx0
Control pytree.  `optimal_observations` additionally applies the
background-error covariance weighting of optobs_roms.h
(error_covariance call): the B^1/2-smoothed sensitivity ranks WHERE an
observation would most constrain J given the prior uncertainty.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..core.state import State
from .i4dvar import (Control, _ad_vjp, _add_control, _zeros_control,
                     make_bsqrt)


def _run_from_control(model, grid, x0: State, nsteps: int,
                      functional: Callable[[State], jnp.ndarray]):
    def J(dx: Control):
        s = _add_control(x0, dx)
        for _ in range(nsteps):
            s = model.step_impl(s, grid)
        return functional(s)
    return J


def adjoint_sensitivity(model, grid, x0: State, nsteps: int,
                        functional: Callable[[State], jnp.ndarray]):
    """One adjoint integration (adsen_roms.h): returns (J, dJ/dx0)
    with the sensitivity as a Control (zeta, u, v, t) pytree at the
    initial time."""
    J = _run_from_control(model, grid, x0, nsteps, functional)
    val, vjp_fn = _ad_vjp(J, _zeros_control(x0))
    (grad,) = vjp_fn(jnp.ones_like(val))
    return val, Control(*jax.tree_util.tree_leaves(grad))


def optimal_observations(model, grid, x0: State, nsteps: int,
                         functional: Callable[[State], jnp.ndarray],
                         sigmas: Control, smooth: int = 2):
    """Optimal-observation ranking (optobs_roms.h): the B-weighted
    adjoint sensitivity B^(1/2) (dJ/dx0).  Larger |field| marks state
    points whose observation would most reduce the uncertainty of J
    under the prior covariance B = (B^1/2)(B^1/2)^T."""
    _, grad = adjoint_sensitivity(model, grid, x0, nsteps, functional)
    bsqrt = make_bsqrt(sigmas, smooth)
    return bsqrt(grad)
