"""Operator-symmetry and background-correlation drivers.

Re-implements the two remaining sanity/diagnostic drivers of the
reference's 4D-Var panel:

  - `Drivers/symmetry.h:9-16`: the weak-constraint inner-loop operator
    H R R' H' must be symmetric (R' H' computed by the adjoint sweep,
    H R by the tangent-linear sweep).  Here the same operator is the
    stabilized representer matrix P = G B G^T (+ R_obs), with
    G = H M built by jvp and G^T by vjp of the observation map —
    `symmetry_check` materializes it column by column and measures
    ||P - P^T||.

  - `Drivers/correlation.h`: the background-error correlation model
    B = S C S with C = C^(1/2) C^(T/2) applied to a unit impulse,
    producing the correlation map of a chosen state point (the test
    the reference uses to visualize/validate the diffusion-operator
    correlation and its normalization coefficients).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .i4dvar import (Control, Observations, _add_control, _ad_jvp,
                     _ad_vjp, _zeros_control, make_bsqrt,
                     observe_trajectory)


def representer_matrix(model, grid, x_b, obs: Observations,
                       nsteps: int, bsqrt, with_robs: bool = False):
    """Materialize P = G B G^T (+ R if with_robs), one obs-space unit
    vector per column (Nobs applications of the TL+AD pair)."""
    dx0 = _zeros_control(x_b)

    def h_of_c(c: Control):
        return observe_trajectory(model, grid, _add_control(x_b, c),
                                  obs, nsteps)

    _, vjp_fn = _ad_vjp(h_of_c, dx0)
    nobs = int(obs.values.size)
    cols = []
    for k in range(nobs):
        w = jnp.zeros(nobs, obs.values.dtype).at[k].set(1.0)
        (cT,) = vjp_fn(w)
        bgtw = bsqrt(bsqrt(Control(*jax.tree_util.tree_leaves(cT))))
        _, gv = _ad_jvp(h_of_c, (dx0,), (bgtw,))
        if with_robs:
            gv = gv + (obs.error ** 2) * w
        cols.append(np.asarray(gv))
    return np.stack(cols, axis=1)


def symmetry_check(model, grid, x_b, obs: Observations, nsteps: int,
                   sigmas: Control, smooth: int = 2):
    """The symmetry.h driver: build H R R' H' = G B G^T and return
    (P, asymmetry) with asymmetry = max|P - P^T| / max|P|.  A correct
    TLM/ADM pair and self-adjoint B^(1/2) give roundoff asymmetry."""
    bsqrt = make_bsqrt(sigmas, smooth)
    P = representer_matrix(model, grid, x_b, obs, nsteps, bsqrt)
    denom = np.abs(P).max() + 1e-30
    asym = np.abs(P - P.T).max() / denom
    return P, float(asym)


def correlation_map(bsqrt, template: Control, field: str, j: int,
                    i: int, k: int = -1, normalize: bool = True):
    """The correlation.h driver: apply B = C^(1/2) C^(T/2) to a unit
    impulse at (field, k, j, i) and return the resulting field of the
    same name — the background-error correlation structure around
    that point.  normalize=True rescales so the map peaks at 1 at the
    impulse point (the job of the reference's normalization
    coefficients, normalization.F)."""
    zero = Control(*[jnp.zeros_like(x) for x in template])
    leaf = getattr(zero, field)
    if leaf.ndim == 3:
        leaf = leaf.at[k, j, i].set(1.0)
    elif leaf.ndim == 4:
        leaf = leaf.at[0, k, j, i].set(1.0)
    else:
        leaf = leaf.at[j, i].set(1.0)
    delta = zero._replace(**{field: leaf})

    # self-adjoint application: B delta = C^(1/2) (C^(T/2) delta);
    # make_bsqrt is symmetric, so applying it twice IS B.
    bd = bsqrt(bsqrt(delta))
    out = getattr(bd, field)
    if not normalize:
        return out
    if out.ndim == 3:
        peak = out[k, j, i]
    elif out.ndim == 4:
        peak = out[0, k, j, i]
    else:
        peak = out[j, i]
    return out / (jnp.abs(peak) + 1e-30)
