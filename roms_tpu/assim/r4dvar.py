"""R4D-Var: indirect representer (weak-ish constraint dual) 4D-Var.

Re-designs the reference's R4D-Var driver (ROMS/Drivers/r4dvar.F:12-55,
r4dvar_roms.h) and its 66k-LoC hand-coded representer kernel
(ROMS/Representer/rp_*.F).  The representer model (RPM) is the
finite-amplitude tangent linearization of the trajectory: where the TLM
propagates dx through jvp about the background, the RPM propagates it
through the full nonlinear model,

    RPM(dx) = H(M(x_b + dx)) - H(M(x_b)),

which is exactly what the reference's rp_main3d approximates by keeping
finite-amplitude terms in the linearized equations.  The method of
indirect representers solves the observation-space system

    (G B G^T + R) beta = d

with CG (the stabilized representer matrix; G = TLM-observation
operator, G^T its adjoint), then evaluates the analysis by sweeping the
RPM with the representer-combined increment — the Picard iteration of
r4dvar.F's inner/outer structure, one Picard pass per outer loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .i4dvar import (Control, Observations, _add_control, _zeros_control,
                     make_bsqrt, observe_trajectory)



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


def rpm_observe(model, grid, x_b, dx: Control, obs: Observations,
                nsteps: int):
    """Finite-amplitude representer propagation of the increment:
    H(M(x_b + dx)) - H(M(x_b)) (the rp_main3d analog)."""
    y_pert = observe_trajectory(model, grid, _add_control(x_b, dx), obs,
                                nsteps)
    y_base = observe_trajectory(model, grid, x_b, obs, nsteps)
    return y_pert - y_base


def representer_matrix_vector(model, grid, x_b, obs: Observations,
                              nsteps: int, bsqrt, w):
    """One application of the stabilized representer matrix
    P w = (G B G^T + R) w (r4dvar's inner-loop operator)."""
    dx0 = _zeros_control(x_b)

    def h_of_c(c: Control):
        return observe_trajectory(model, grid, _add_control(x_b, c),
                                  obs, nsteps)

    _, vjp_fn = _ad_vjp(h_of_c, dx0)
    (cT,) = vjp_fn(w)
    bgtw = bsqrt(bsqrt(Control(*jax.tree_util.tree_leaves(cT))))
    _, gv = _ad_jvp(h_of_c, (dx0,), (bgtw,))
    R = obs.error ** 2
    return gv + R * w, bgtw


def r4dvar(model, grid, x_b, obs: Observations, nsteps: int,
           sigmas: Control, n_inner: int = 10, n_outer: int = 1,
           smooth: int = 2):
    """Indirect-representer analysis.  Returns (x_a, diagnostics)."""
    bsqrt = make_bsqrt(sigmas, smooth)
    history = []
    x_k = x_b
    for outer in range(n_outer):
        y_k = observe_trajectory(model, grid, x_k, obs, nsteps)
        d = obs.values - y_k

        # CG on (G B G^T + R) beta = d in observation space
        beta = jnp.zeros_like(d)
        r = d
        p = r
        rs = jnp.sum(r * r)
        for it in range(n_inner):
            Ap, _ = representer_matrix_vector(model, grid, x_k, obs,
                                              nsteps, bsqrt, p)
            alpha = rs / jnp.maximum(jnp.sum(p * Ap), 1e-30)
            beta = beta + alpha * p
            r = r - alpha * Ap
            rs_new = jnp.sum(r * r)
            history.append(float(rs_new))
            pbeta = rs_new / jnp.maximum(rs, 1e-30)
            p = r + pbeta * p
            rs = rs_new

        # analysis increment dx = B G^T beta, applied through the RPM
        # (finite-amplitude Picard sweep)
        _, dx_ctrl = representer_matrix_vector(model, grid, x_k, obs,
                                               nsteps, bsqrt, beta)
        x_k = _add_control(x_k, dx_ctrl)

    y_a = observe_trajectory(model, grid, x_k, obs, nsteps)
    diag = {
        "residual_history": history,
        "rms_innovation_b": float(jnp.sqrt(jnp.mean(
            (obs.values - observe_trajectory(model, grid, x_b, obs,
                                             nsteps)) ** 2))),
        "rms_innovation_a": float(jnp.sqrt(jnp.mean(
            (obs.values - y_a) ** 2))),
    }
    return x_k, diag


def representer_check(model, grid, x_b, obs: Observations, nsteps: int,
                      dx: Control, eps: float = 1.0e-4):
    """Picard/representer consistency test (the picard_roms.h analog):
    the RPM must converge to the TLM in the small-amplitude limit,

        || RPM(eps*dx)/eps - TLM(dx) || -> 0   as eps -> 0.

    Returns the relative defect at eps and eps/10 — the second must be
    ~10x smaller (first-order convergence) for a correct RPM."""
    dx0 = _zeros_control(x_b)

    def h_of_c(c: Control):
        return observe_trajectory(model, grid, _add_control(x_b, c),
                                  obs, nsteps)

    _, tlm = _ad_jvp(h_of_c, (dx0,), (dx,))
    nrm = jnp.linalg.norm(tlm) + 1e-30

    def defect(e):
        scaled = Control(*[e * x for x in
                           jax.tree_util.tree_leaves(dx)])
        rpm = rpm_observe(model, grid, x_b, scaled, obs, nsteps) / e
        return float(jnp.linalg.norm(rpm - tlm) / nrm)

    return defect(eps), defect(eps / 10.0)
