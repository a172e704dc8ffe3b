"""Incremental strong-constraint 4D-Var (I4D-Var).

Re-designs the reference's I4D-Var driver (ROMS/Drivers/i4dvar.F:12-55,
i4dvar_roms.h) around autodiff: the hand-coded TLM/ADM sweeps
(tl_main3d/ad_main3d) become jax.jvp/jax.vjp of the jitted trajectory
operator, and the Lanczos/CG minimizer (ROMS/Utility/congrad.F:161)
becomes a conjugate-gradient solve of the preconditioned normal
equations in control space:

    (I + G^T R^-1 G) v = G^T R^-1 d,      dx = B^1/2 v

with B^1/2 modeled as a diffusion-operator convolution
(ROMS/Utility/convolve.F:11-14) — `smooth` Laplacian passes scaled by
per-field background standard deviations (normalization.F analog).

Control vector: increments of (zeta, u, v, t) at the analysis time.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import State



def _ad_jvp(*a, **kw):
    """jax.jvp with the Pallas kernels disabled for the traced region
    (pallas_call has no AD rules; ops/kernel_gate.py)."""
    from ..ops.kernel_gate import no_pallas
    import jax as _jax
    with no_pallas():
        return _jax.jvp(*a, **kw)


def _ad_vjp(*a, **kw):
    """jax.vjp under no_pallas(); NOTE the returned vjp_fn retraces
    nothing — the forward trace (already kernel-free) defines it."""
    from ..ops.kernel_gate import no_pallas
    import jax as _jax
    with no_pallas():
        return _jax.vjp(*a, **kw)


class Observations(NamedTuple):
    """Trajectory observations: field values at a fixed step index."""
    step: int                  # observation time index (1-based steps)
    field: str                 # 'zeta' | 'temp' | 'salt' | 'u' | 'v'
    indices: jnp.ndarray       # (Nobs, ndim) integer indices into field
    values: jnp.ndarray        # (Nobs,) observed values
    error: float               # observation std


class Control(NamedTuple):
    zeta: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    t: jnp.ndarray


def _zeros_control(state: State) -> Control:
    return Control(zeta=jnp.zeros_like(state.zeta),
                   u=jnp.zeros_like(state.u),
                   v=jnp.zeros_like(state.v),
                   t=jnp.zeros_like(state.t))


def _add_control(state: State, dx: Control) -> State:
    return state._replace(zeta=state.zeta + dx.zeta,
                          u=state.u + dx.u, v=state.v + dx.v,
                          t=state.t + dx.t)


def _dot(a: Control, b: Control):
    return sum(jnp.vdot(x, y) for x, y in
               zip(jax.tree_util.tree_leaves(a),
                   jax.tree_util.tree_leaves(b)))


def make_bsqrt(sigmas: Control, smooth: int = 2, rmask=None):
    """Diffusion-convolution square-root background covariance.

    B^1/2 v = sigma * L^smooth v with L a 1-2-1 horizontal smoother —
    the discrete analog of convolve.F's diffusion-operator filter.
    With ``rmask`` (MASKING apps, e.g. CHANNEL_NECK/correlation.h),
    the smoother is masked each iteration so correlations do not leak
    through land, matching convolve.F's masked diffusion fluxes; the
    masked operator stays self-adjoint (M L M with M, L symmetric).
    """
    def lap(f):
        f1 = 0.25 * (jnp.roll(f, 1, -1) + jnp.roll(f, -1, -1)
                     + jnp.roll(f, 1, -2) + jnp.roll(f, -1, -2))
        return 0.5 * f + 0.5 * f1

    def mask_for(shape):
        if rmask is None:
            return None
        m = jnp.asarray(rmask)
        Mj, Li = m.shape
        mj, li = shape[-2], shape[-1]
        if (mj, li) == (Mj, Li):
            return m
        if (mj, li) == (Mj, Li - 1):          # u points
            return m[:, 1:] * m[:, :-1]
        if (mj, li) == (Mj - 1, Li):          # v points
            return m[1:, :] * m[:-1, :]
        return None

    def bsqrt(v: Control) -> Control:
        out = []
        for s, f in zip(jax.tree_util.tree_leaves(sigmas),
                        jax.tree_util.tree_leaves(v)):
            m = mask_for(f.shape)
            if m is not None:
                f = f * m
            for _ in range(smooth):
                f = lap(f)
                if m is not None:
                    f = f * m
            out.append(s * f)
        return Control(*out)

    return bsqrt


def observe_trajectory(model, grid, state: State, obs: Observations,
                       nsteps: int):
    """Run the trajectory and extract observed values H(M(x))."""
    s = state
    vals = None
    for n in range(1, nsteps + 1):
        s = model.step_impl(s, grid)
        if n == obs.step:
            field = {"zeta": s.zeta, "u": s.u, "v": s.v,
                     "temp": s.t[0], "salt": s.t[1]}[obs.field]
            vals = field[tuple(obs.indices.T)]
    return vals


def i4dvar(model, grid, x_b: State, obs: Observations, nsteps: int,
           sigmas: Control, n_inner: int = 10, n_outer: int = 1,
           smooth: int = 2):
    """Incremental 4D-Var analysis.

    Returns (x_a, diagnostics dict with cost history).
    """
    bsqrt = make_bsqrt(sigmas, smooth)
    oR = 1.0 / (obs.error ** 2)
    history = []

    def hm(dx_ctrl: Control):
        return observe_trajectory(model, grid, _add_control(x_b, dx_ctrl),
                                  obs, nsteps)

    x_k = x_b
    v_tot = _zeros_control(x_b)
    for outer in range(n_outer):
        dx0 = _zeros_control(x_b)
        # innovations at the current outer iterate
        y_k = observe_trajectory(model, grid, x_k, obs, nsteps)
        d = obs.values - y_k

        # linearized observation operator about x_k (in control space)
        def G(v: Control):
            _, tang = _ad_jvp(
                lambda c: observe_trajectory(model, grid,
                                             _add_control(x_k, c), obs,
                                             nsteps),
                (dx0,), (bsqrt(v),))
            return tang

        _, vjp_fn = _ad_vjp(
            lambda c: observe_trajectory(model, grid,
                                         _add_control(x_k, c), obs,
                                         nsteps), dx0)

        def GT(w):
            (c,) = vjp_fn(w)
            return bsqrt(Control(*jax.tree_util.tree_leaves(c)))

        def A(v: Control):
            return Control(*[a + b for a, b in
                             zip(jax.tree_util.tree_leaves(v),
                                 jax.tree_util.tree_leaves(
                                     GT(oR * G(v))))])

        # CG on A v = GT(oR d)  (congrad.F equivalent)
        b_rhs = GT(oR * d)
        v = _zeros_control(x_b)
        r = b_rhs
        p = r
        rs = _dot(r, r)
        for it in range(n_inner):
            Ap = A(p)
            alpha = rs / jnp.maximum(_dot(p, Ap), 1e-30)
            v = Control(*[x + alpha * y for x, y in
                          zip(jax.tree_util.tree_leaves(v),
                              jax.tree_util.tree_leaves(p))])
            r = Control(*[x - alpha * y for x, y in
                          zip(jax.tree_util.tree_leaves(r),
                              jax.tree_util.tree_leaves(Ap))])
            rs_new = _dot(r, r)
            history.append(float(rs_new))
            beta = rs_new / jnp.maximum(rs, 1e-30)
            p = Control(*[x + beta * y for x, y in
                          zip(jax.tree_util.tree_leaves(r),
                              jax.tree_util.tree_leaves(p))])
            rs = rs_new

        x_k = _add_control(x_k, bsqrt(v))
        v_tot = Control(*[a + b for a, b in
                          zip(jax.tree_util.tree_leaves(v_tot),
                              jax.tree_util.tree_leaves(v))])

    # final innovation for reporting
    y_a = observe_trajectory(model, grid, x_k, obs, nsteps)
    stats = {
        "residual_history": history,
        "rms_innovation_b": float(jnp.sqrt(jnp.mean(
            (obs.values - observe_trajectory(model, grid, x_b, obs,
                                             nsteps)) ** 2))),
        "rms_innovation_a": float(jnp.sqrt(jnp.mean(
            (obs.values - y_a) ** 2))),
    }
    return x_k, stats


def rbl4dvar(model, grid, x_b: State, obs: Observations, nsteps: int,
             sigmas: Control, n_inner: int = 10, n_outer: int = 1,
             smooth: int = 2):
    """Restricted B-preconditioned (dual, observation-space) 4D-Var.

    The reference's RBL4D-Var driver (ROMS/Drivers/rbl4dvar.h,
    rbl4dvar_ocean.h) solves the dual problem

        (G B G^T + R) w = d,      dx = B G^T w

    where G is the tangent-linear trajectory-observation operator and
    B = B^{1/2} B^{T/2} the modeled background covariance.  The system
    is only nobs-dimensional, so the CG runs in observation space
    (cost per iteration: one TLM + one ADM sweep, like the primal).
    Returns (x_a, diagnostics)."""
    bsqrt = make_bsqrt(sigmas, smooth)
    R = obs.error ** 2
    history = []
    dx0 = _zeros_control(x_b)

    x_k = x_b
    for outer in range(n_outer):
        y_k = observe_trajectory(model, grid, x_k, obs, nsteps)
        d = obs.values - y_k

        def G(v: Control):
            _, tang = _ad_jvp(
                lambda c: observe_trajectory(model, grid,
                                             _add_control(x_k, c), obs,
                                             nsteps),
                (dx0,), (bsqrt(v),))
            return tang

        _, vjp_fn = _ad_vjp(
            lambda c: observe_trajectory(model, grid,
                                         _add_control(x_k, c), obs,
                                         nsteps), dx0)

        def GT(w):
            (c,) = vjp_fn(w)
            return bsqrt(Control(*jax.tree_util.tree_leaves(c)))

        def A(w):
            # (G B G^T + R) w, all in observation space
            return G(GT(w)) + R * w

        # CG in observation space on A w = d
        w = jnp.zeros_like(d)
        r = d
        p = r
        rs = jnp.sum(r * r)
        for it in range(n_inner):
            Ap = A(p)
            alpha = rs / jnp.maximum(jnp.sum(p * Ap), 1e-30)
            w = w + alpha * p
            r = r - alpha * Ap
            rs_new = jnp.sum(r * r)
            history.append(float(rs_new))
            beta = rs_new / jnp.maximum(rs, 1e-30)
            p = r + beta * p
            rs = rs_new

        x_k = _add_control(x_k, bsqrt(GT(w)))

    y_a = observe_trajectory(model, grid, x_k, obs, nsteps)
    diag = {"residual_history": history,
            "final_innovation": float(jnp.abs(obs.values - y_a).max())}
    return x_k, diag


def compute_normalization(bsqrt, template: Control, nsamples: int = 64,
                          key=None):
    """Error-covariance normalization coefficients (the reference's
    normalization.F "randomized" method, Fisher & Courtier 1995):
    estimate sqrt(diag(B)) = sqrt(diag(B^{1/2} B^{T/2})) from random
    probes v ~ N(0,1):  diag(B) ~= E[(B^{1/2} v)^2].

    Dividing B^{1/2} output by these factors gives unit background
    variance, so the sigmas supplied to make_bsqrt act as true
    standard deviations.  Returns a Control of per-point factors.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    leaves = jax.tree_util.tree_leaves(template)
    acc = [jnp.zeros_like(x) for x in leaves]
    for n in range(nsamples):
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, len(leaves))
        probe = Control(*[jax.random.normal(k, jnp.shape(x))
                          for k, x in zip(keys, leaves)])
        smoothed = jax.tree_util.tree_leaves(bsqrt(probe))
        acc = [a + v * v for a, v in zip(acc, smoothed)]
    return Control(*[jnp.sqrt(a / nsamples + 1e-30) for a in acc])


def quality_control(obs: Observations, y_background,
                    threshold: float = 4.0):
    """Background (innovation) quality control (the reference's
    obs_check in ROMS/Utility/obs_*.F): reject observations whose
    innovation exceeds `threshold` times the observation error by
    inflating their error to an effectively-infinite value, which
    removes their influence on the analysis without reshaping arrays
    (jit-friendly).  Returns (obs with per-obs error array, reject
    mask)."""
    d = jnp.abs(obs.values - y_background)
    err = jnp.broadcast_to(jnp.asarray(obs.error), d.shape)
    reject = d > threshold * err
    err_qc = jnp.where(reject, 1.0e10, err)
    return obs._replace(error=err_qc), reject
