"""4D-Var control vectors beyond initial conditions, observation
sensitivity, and array modes.

Extends the incremental machinery of assim.i4dvar with the reference's
adjustable-control families:

  - surface-forcing adjustments (ADJUST_WSTRESS / ADJUST_STFLUX,
    ROMS/Nonlinear/frc_adjust.F:1-336): time-windowed increments of
    (sustr, svstr, stflx) at Nfrec record times, linearly interpolated
    to the model clock each step and ADDED to the background forcing —
    here through the step's `forcing_adjust` hook so jax.jvp/vjp
    differentiate straight through the interpolation;
  - open-boundary adjustments (ADJUST_BOUNDARY,
    ROMS/Nonlinear/obc_adjust.F:1-843): per-edge, per-variable
    increments at Nbrec record times added to the boundary data the
    OBC kernels consume;
  - the observation-sensitivity driver family
    (ROMS/Drivers/obs_sen_rbl4dvar_analysis.h, obs_sen_i4dvar_analysis.h):
    the adjoint of the analysis with respect to the observations,
        dJ/dy = (G B G^T + R)^{-1} G B (dJ/dx),
    computed with one vjp for dJ/dx and a CG solve in observation
    space;
  - array modes (ROMS/Drivers/array_modes_w4dvar.h): eigenpairs of the
    stabilized representer matrix G B G^T + R and the associated
    control-space array modes B G^T z_k, ranking what the observation
    array can actually constrain.

Everything is a pure function of pytrees; the hand-written adjoints of
the reference (ad_frc_adjust, ad_obc_adjust) do not exist here — they
are jax.vjp of the forward code.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import State
from .i4dvar import Control, _ad_jvp, _ad_vjp, make_bsqrt

tree_map = jax.tree_util.tree_map
tree_leaves = jax.tree_util.tree_leaves


class ForcingControl(NamedTuple):
    """Surface-forcing adjustment records (frc_adjust.F analog).

    Arrays carry a leading Nfrec record-time axis: sustr/svstr
    (Nfrec, Mj, Li), stflx (Nfrec, NAT, Mj, Li)."""
    sustr: jnp.ndarray
    svstr: jnp.ndarray
    stflx: jnp.ndarray


class ExtControl(NamedTuple):
    """Extended 4D-Var control vector.

    ic: initial-condition increments (assim.i4dvar.Control) or None;
    frc: ForcingControl or None; obc: boundary-adjustment pytree in the
    core.obc data layout with a leading Nbrec axis per array
    ({"zeta": {"west": (Nbrec, Mj)}, "t": {0: {...}}, ...}) or None.
    """
    ic: Optional[Control]
    frc: Optional[ForcingControl]
    obc: Optional[dict]


def zeros_forcing_control(cfg, nfrec: int) -> ForcingControl:
    Mj, Li = cfg.shape2d
    dtype = jnp.dtype(cfg.dtype)
    return ForcingControl(
        sustr=jnp.zeros((nfrec, Mj, Li), dtype),
        svstr=jnp.zeros((nfrec, Mj, Li), dtype),
        stflx=jnp.zeros((nfrec, cfg.NAT, Mj, Li), dtype))


def interp_records(times, values, t):
    """Linear interpolation over the leading record axis — the
    set_data.F two-snapshot weighting, differentiable w.r.t. values."""
    times = jnp.asarray(times)
    idx = jnp.clip(jnp.searchsorted(times, t) - 1, 0,
                   times.shape[0] - 2)
    t0 = times[idx]
    t1 = times[idx + 1]
    w = jnp.clip((t - t0) / (t1 - t0), 0.0, 1.0)
    return (1.0 - w) * values[idx] + w * values[idx + 1]


def _merge_obc(base: dict, delta: dict) -> dict:
    """Recursively add boundary adjustments onto base boundary data
    (obc_adjust.F: the increment adds to BOUNDARY(ng)%...)."""
    out = dict(base)
    for key, val in delta.items():
        if isinstance(val, dict):
            out[key] = _merge_obc(out.get(key, {}), val)
        else:
            out[key] = out[key] + val if key in out else val
    return out


def make_ext_bsqrt(sigmas: ExtControl, smooth: int = 2):
    """Square-root background covariance for the extended control.

    IC and forcing-record leaves get the horizontal diffusion smoother
    over their trailing (eta, xi) axes (convolve.F analog); boundary
    leaves are smoothed along the edge line only (the reference's 1-D
    boundary convolution, obc_adjust + convolve 1D path).  Returns
    (bsqrt, bsqrt_T) — the transpose swaps the sigma-scaling and
    smoothing order so B = bsqrt o bsqrt_T is exactly symmetric.
    """
    def lap2(f):
        f1 = 0.25 * (jnp.roll(f, 1, -1) + jnp.roll(f, -1, -1)
                     + jnp.roll(f, 1, -2) + jnp.roll(f, -1, -2))
        return 0.5 * f + 0.5 * f1

    def lap1(f):
        return 0.5 * f + 0.25 * (jnp.roll(f, 1, -1)
                                 + jnp.roll(f, -1, -1))

    def _apply(sig_tree, v_tree, lap, transpose):
        def one(s, f):
            if transpose:
                f = s * f
            for _ in range(smooth):
                f = lap(f)
            if not transpose:
                f = s * f
            return f
        return tree_map(one, sig_tree, v_tree)

    def _bsqrt(v: ExtControl, transpose: bool) -> ExtControl:
        ic = (_apply(sigmas.ic, v.ic, lap2, transpose)
              if v.ic is not None else None)
        frc = (_apply(sigmas.frc, v.frc, lap2, transpose)
               if v.frc is not None else None)
        obc = (_apply(sigmas.obc, v.obc, lap1, transpose)
               if v.obc is not None else None)
        return ExtControl(ic=ic, frc=frc, obc=obc)

    return (lambda v: _bsqrt(v, False)), (lambda v: _bsqrt(v, True))


def uniform_sigmas(template: ExtControl, ic_sigma=0.0, frc_sigma=0.0,
                   obc_sigma=0.0) -> ExtControl:
    """Constant per-family background standard deviations shaped like
    the control template (std-file analog for idealized runs)."""
    def const(tree, s):
        return None if tree is None else tree_map(lambda _: s, tree)
    return ExtControl(ic=const(template.ic, ic_sigma),
                      frc=const(template.frc, frc_sigma),
                      obc=const(template.obc, obc_sigma))


def zeros_like_control(c: ExtControl) -> ExtControl:
    return tree_map(jnp.zeros_like, c)


def tree_dot(a, b):
    return sum(jnp.vdot(x, y)
               for x, y in zip(tree_leaves(a), tree_leaves(b)))


def tree_axpy(alpha, x, y):
    """alpha*x + y over matching pytrees."""
    return tree_map(lambda u, w: alpha * u + w, x, y)


def observe_trajectory_ctrl(model, grid, x0: State, ctrl: ExtControl,
                            obs, nsteps: int, frc_times=None,
                            obc_times=None, base_obc_fn=None):
    """Run the trajectory under the extended control and extract the
    observed values H(M(x0 + ic; frc + dfrc; obc + dobc)).

    frc_times/obc_times: record times (seconds) of the adjustment
    arrays' leading axes.  base_obc_fn defaults to the model's own.
    """
    s = x0
    if ctrl.ic is not None:
        s = s._replace(zeta=s.zeta + ctrl.ic.zeta,
                       u=s.u + ctrl.ic.u, v=s.v + ctrl.ic.v,
                       t=s.t + ctrl.ic.t)
    if base_obc_fn is None:
        base_obc_fn = model.obc_fn
    vals = None
    for n in range(1, nsteps + 1):
        adj = None
        if ctrl.frc is not None:
            adj = {"sustr": interp_records(frc_times, ctrl.frc.sustr,
                                           s.time),
                   "svstr": interp_records(frc_times, ctrl.frc.svstr,
                                           s.time),
                   "stflx": interp_records(frc_times, ctrl.frc.stflx,
                                           s.time)}
        obc = None
        if ctrl.obc is not None:
            delta = tree_map(
                lambda a: interp_records(obc_times, a, s.time), ctrl.obc)
            base = base_obc_fn(s.time) if base_obc_fn else {}
            obc = _merge_obc(base, delta)
        elif base_obc_fn is not None:
            obc = base_obc_fn(s.time)
        s = model.step_impl(s, grid, obc_data=obc, forcing_adjust=adj)
        if n == obs.step:
            field = {"zeta": s.zeta, "u": s.u, "v": s.v,
                     "temp": s.t[0], "salt": s.t[1]}[obs.field]
            vals = field[tuple(obs.indices.T)]
    return vals


def i4dvar_ctrl(model, grid, x_b: State, obs, nsteps: int,
                template: ExtControl, sigmas: ExtControl,
                n_inner: int = 10, smooth: int = 2,
                frc_times=None, obc_times=None):
    """Incremental 4D-Var over the extended control vector.

    Same preconditioned-CG normal-equation solve as assim.i4dvar but
    with the control spanning IC/forcing/boundary adjustments.  Returns
    (ctrl_analysis, diagnostics).  The analysis state is obtained by
    running observe_trajectory_ctrl with the returned control (or use
    the ic part directly)."""
    bsqrt, bsqrt_T = make_ext_bsqrt(sigmas, smooth)
    oR = 1.0 / (obs.error ** 2)
    zero = zeros_like_control(template)

    def hm(c: ExtControl):
        return observe_trajectory_ctrl(model, grid, x_b, c, obs, nsteps,
                                       frc_times=frc_times,
                                       obc_times=obc_times)

    d = obs.values - hm(zero)

    def G(v):
        _, tang = _ad_jvp(hm, (zero,), (bsqrt(v),))
        return tang

    _, vjp_fn = _ad_vjp(hm, zero)

    def GT(w):
        (c,) = vjp_fn(w)
        return bsqrt_T(c)

    def A(v):
        return tree_axpy(1.0, v, GT(oR * G(v)))

    history = []
    b_rhs = GT(oR * d)
    v = zero
    r = b_rhs
    p = r
    rs = tree_dot(r, r)
    for _ in range(n_inner):
        Ap = A(p)
        alpha = rs / jnp.maximum(tree_dot(p, Ap), 1e-30)
        v = tree_axpy(alpha, p, v)
        r = tree_axpy(-alpha, Ap, r)
        rs_new = tree_dot(r, r)
        history.append(float(rs_new))
        p = tree_axpy(rs_new / jnp.maximum(rs, 1e-30), p, r)
        rs = rs_new

    ctrl_a = bsqrt(v)
    y_a = hm(ctrl_a)
    diag = {"residual_history": history,
            "rms_innovation_b": float(jnp.sqrt(jnp.mean(d ** 2))),
            "rms_innovation_a": float(jnp.sqrt(jnp.mean(
                (obs.values - y_a) ** 2)))}
    return ctrl_a, diag


def obs_sensitivity(model, grid, x_b: State, obs, nsteps: int,
                    template: ExtControl, sigmas: ExtControl,
                    functional: Callable[[ExtControl], jnp.ndarray],
                    n_inner: int = 15, smooth: int = 2,
                    frc_times=None, obc_times=None):
    """Observation-sensitivity driver (obs_sen_rbl4dvar_analysis.h).

    For the (linearized) analysis ctrl_a = B G^T (G B G^T + R)^{-1} d
    and a scalar functional J(ctrl) of the analysis, the sensitivity of
    J to each observation value is

        dJ/dy = (G B G^T + R)^{-1} G B (dJ/dctrl)

    (one vjp of J, then a CG solve in observation space).  Returns the
    (Nobs,) sensitivity vector: |dJ/dy_i| ranks each observation's
    impact on J; its sign gives the direction.
    """
    bsqrt, bsqrt_T = make_ext_bsqrt(sigmas, smooth)
    R = obs.error ** 2
    zero = zeros_like_control(template)

    def hm(c):
        return observe_trajectory_ctrl(model, grid, x_b, c, obs, nsteps,
                                       frc_times=frc_times,
                                       obc_times=obc_times)

    def Gtilde(v):
        _, tang = _ad_jvp(hm, (zero,), (bsqrt(v),))
        return tang

    _, vjp_fn = _ad_vjp(hm, zero)

    def GtildeT(w):
        (c,) = vjp_fn(w)
        return bsqrt_T(c)

    # dJ/dctrl via one vjp of the functional (ad_* analog)
    _, jvjp = _ad_vjp(functional, zero)
    (gJ,) = jvjp(jnp.asarray(1.0))
    rhs = Gtilde(bsqrt_T(gJ))                   # G B (dJ/dctrl)

    def A(w):
        return Gtilde(GtildeT(w)) + R * w

    s = jnp.zeros_like(rhs)
    r = rhs
    p = r
    rs = jnp.sum(r * r)
    for _ in range(n_inner):
        Ap = A(p)
        alpha = rs / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        s = s + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.sum(r * r)
        p = r + rs_new / jnp.maximum(rs, 1e-30) * p
        rs = rs_new
    return s


def array_modes(model, grid, x_b: State, obs, nsteps: int,
                template: ExtControl, sigmas: ExtControl,
                smooth: int = 2, frc_times=None, obc_times=None):
    """Array modes of the stabilized representer matrix
    (array_modes_w4dvar.h): eigenpairs of P = G B G^T + R (observation
    space, size Nobs) and the control-space modes B G^T z_k that show
    WHAT spatial structures the observation array constrains.

    The matrix is materialized column-by-column (Nobs tangent sweeps) —
    the observation count in array-mode studies is small by design.
    Returns (eigenvalues desc, Z (Nobs, Nobs) eigenvectors as columns,
    modes list of ExtControl)."""
    bsqrt, bsqrt_T = make_ext_bsqrt(sigmas, smooth)
    R = obs.error ** 2
    zero = zeros_like_control(template)
    nobs = int(obs.values.shape[0])

    def hm(c):
        return observe_trajectory_ctrl(model, grid, x_b, c, obs, nsteps,
                                       frc_times=frc_times,
                                       obc_times=obc_times)

    def Gtilde(v):
        _, tang = _ad_jvp(hm, (zero,), (bsqrt(v),))
        return tang

    _, vjp_fn = _ad_vjp(hm, zero)

    def GtildeT(w):
        (c,) = vjp_fn(w)
        return bsqrt_T(c)

    cols = []
    for j in range(nobs):
        e = jnp.zeros((nobs,)).at[j].set(1.0)
        cols.append(np.asarray(Gtilde(GtildeT(e))))
    P = np.stack(cols, axis=1)
    P = 0.5 * (P + P.T) + np.asarray(R) * np.eye(nobs)
    evals, Z = np.linalg.eigh(P)
    order = np.argsort(evals)[::-1]
    evals = evals[order]
    Z = Z[:, order]
    modes = [bsqrt(GtildeT(jnp.asarray(Z[:, k]))) for k in range(nobs)]
    return evals, Z, modes
