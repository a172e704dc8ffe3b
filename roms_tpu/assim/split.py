"""Split-phase 4D-Var drivers (operational scheduling).

The reference's split drivers (ROMS/Drivers/split_i4dvar_roms.h,
split_rbl4dvar_roms.h) run one 4D-Var cycle as SEPARATE executions —
background, increment (inner loops), analysis — communicating only
through files, so a scheduler can restart, requeue or re-run any phase
independently.  Here each phase is a standalone function that takes a
freshly built Model plus an exchange directory; state crosses phase
boundaries only as .npz archives (the NetCDF hand-off of the
reference), never in memory.

    phase_background(model, grid, x_b, obs, nsteps, dir)
    phase_increment(model, grid, obs, nsteps, sigmas, dir, n_inner)
    phase_analysis(model, grid, obs, nsteps, dir)

Running the three phases in order reproduces assim.i4dvar.i4dvar
(n_outer=1) exactly — asserted in tests/test_split_4dvar.py.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..core.state import State
from .i4dvar import (Control, Observations, _ad_jvp, _ad_vjp,
                     _add_control, _dot, _zeros_control, make_bsqrt,
                     observe_trajectory)

tree_leaves = jax.tree_util.tree_leaves


def _save_tree(path, tree, fields):
    np.savez(path, **{k: np.asarray(v)
                      for k, v in zip(fields, tree_leaves(tree))})


def _load_state(path, template: State) -> State:
    with np.load(path) as z:
        return template._replace(
            **{k: jnp.asarray(z[k]) for k in z.files})


def _load_control(path) -> Control:
    with np.load(path) as z:
        return Control(zeta=jnp.asarray(z["zeta"]),
                       u=jnp.asarray(z["u"]), v=jnp.asarray(z["v"]),
                       t=jnp.asarray(z["t"]))


_STATE_KEYS = ("zeta", "ubar", "vbar", "u", "v", "t")


def _state_payload(s: State):
    return {k: np.asarray(getattr(s, k)) for k in _STATE_KEYS}


def phase_background(model, grid, x_b: State, obs: Observations,
                     nsteps: int, exdir: str):
    """Phase 1 (split NLM run): propagate the background, record the
    innovation vector d = y - H(M(x_b)) and archive the background
    state for the later phases."""
    os.makedirs(exdir, exist_ok=True)
    y_b = observe_trajectory(model, grid, x_b, obs, nsteps)
    d = obs.values - y_b
    np.savez(os.path.join(exdir, "background.npz"),
             d=np.asarray(d), y_b=np.asarray(y_b),
             time=np.asarray(x_b.time), **_state_payload(x_b))
    return {"rms_innovation_b": float(jnp.sqrt(jnp.mean(d ** 2)))}


def phase_increment(model, grid, obs: Observations, nsteps: int,
                    sigmas: Control, exdir: str, n_inner: int = 10,
                    smooth: int = 2):
    """Phase 2 (split inner loops): the preconditioned-CG minimization
    about the archived background (congrad.F equivalent), writing the
    control-space increment."""
    bg = np.load(os.path.join(exdir, "background.npz"))
    x_b = _bg_state(model, grid, bg)
    d = jnp.asarray(bg["d"])
    bsqrt = make_bsqrt(sigmas, smooth)
    oR = 1.0 / (obs.error ** 2)
    dx0 = _zeros_control(x_b)

    def G(v: Control):
        _, tang = _ad_jvp(
            lambda c: observe_trajectory(model, grid,
                                         _add_control(x_b, c), obs,
                                         nsteps), (dx0,), (bsqrt(v),))
        return tang

    _, vjp_fn = _ad_vjp(
        lambda c: observe_trajectory(model, grid,
                                     _add_control(x_b, c), obs,
                                     nsteps), dx0)

    def GT(w):
        (c,) = vjp_fn(w)
        return bsqrt(Control(*tree_leaves(c)))

    def axpy(a, x, y):
        return Control(*[xx * a + yy for xx, yy in
                         zip(tree_leaves(x), tree_leaves(y))])

    def A(v: Control):
        return axpy(1.0, v, GT(oR * G(v)))

    history = []
    b_rhs = GT(oR * d)
    v = _zeros_control(x_b)
    r = b_rhs
    p = r
    rs = _dot(r, r)
    for _ in range(n_inner):
        Ap = A(p)
        alpha = rs / jnp.maximum(_dot(p, Ap), 1e-30)
        v = axpy(alpha, p, v)
        r = axpy(-alpha, Ap, r)
        rs_new = _dot(r, r)
        history.append(float(rs_new))
        beta = rs_new / jnp.maximum(rs, 1e-30)
        p = axpy(beta, p, r)
        rs = rs_new

    dx = bsqrt(v)
    _save_tree(os.path.join(exdir, "increment.npz"), dx,
               ("zeta", "u", "v", "t"))
    return {"residual_history": history}


def phase_analysis(model, grid, obs: Observations, nsteps: int,
                   exdir: str):
    """Phase 3 (split analysis NLM run): apply the archived increment
    to the background, rerun the nonlinear model and archive the
    analysis.  Returns (x_a, diagnostics)."""
    bg = np.load(os.path.join(exdir, "background.npz"))
    x_b = _bg_state(model, grid, bg)
    dx = _load_control(os.path.join(exdir, "increment.npz"))
    x_a = _add_control(x_b, dx)
    y_a = observe_trajectory(model, grid, x_a, obs, nsteps)
    np.savez(os.path.join(exdir, "analysis.npz"),
             y_a=np.asarray(y_a), time=np.asarray(x_a.time),
             **_state_payload(x_a))
    return x_a, {
        "rms_innovation_b": float(jnp.sqrt(jnp.mean(
            jnp.asarray(bg["d"]) ** 2))),
        "rms_innovation_a": float(jnp.sqrt(jnp.mean(
            (obs.values - y_a) ** 2))),
    }


def _bg_state(model, grid, bg) -> State:
    """Reconstruct the background State from the exchange archive on a
    fresh Model (diagnostic fields rebuilt from the prognostic ones)."""
    from ..core.state import initial_state
    s = initial_state(model.cfg, grid,
                      zeta=jnp.asarray(bg["zeta"]),
                      t=jnp.asarray(bg["t"]))
    s = s._replace(ubar=jnp.asarray(bg["ubar"]),
                   vbar=jnp.asarray(bg["vbar"]),
                   u=jnp.asarray(bg["u"]), v=jnp.asarray(bg["v"]),
                   time=float(bg["time"]))
    return s
