"""Generalized stability theory (GST) analysis.

Re-designs the reference's propagator drivers + ARPACK reverse-
communication stack (Master/propagator.F:16-30, mod_storage.F:13-39,
afte/fte/fsv drivers) around autodiff: the tangent propagator is
jax.jvp of the trajectory map, its adjoint is jax.vjp, and the implicitly
restarted Arnoldi of ARPACK becomes an explicit Lanczos/Arnoldi
iteration on those operators.

Supported analyses (Master/propagator.F:16-30 driver set):
  - FTE  (finite-time eigenmodes):       Arnoldi eigs of M
  - AFTE (adjoint eigenmodes):           Arnoldi eigs of M^T
  - OP   (optimal perturbations):        Lanczos eigs of M^T M
  - FSV  (forcing singular vectors):     Lanczos on the forcing
         propagator Mf^T Mf (constant-in-time forcing perturbation)
  - SO   (stochastic optimals):          Lanczos eigs of
         S = sum_t M_t^T M_t over snapshot times
  - SO-trace: randomized (Hutchinson) trace of S
  - HOP  (Hessian singular vectors):     Lanczos eigs of a supplied
         Hessian-vector product (preconditioned 4D-Var Hessian)
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np



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


def _flat(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate([x.ravel() for x in leaves])


def _unflat(vec, template):
    leaves, treedef = jax.tree_util.tree_flatten(template)
    out = []
    pos = 0
    for x in leaves:
        n = x.size
        out.append(vec[pos:pos + n].reshape(x.shape).astype(x.dtype))
        pos += n
    return jax.tree_util.tree_unflatten(treedef, out)


def make_propagators(traj_fn: Callable, x0):
    """traj_fn: perturbation pytree -> final perturbation pytree base
    point is handled by the caller (traj_fn already linearizes about its
    trajectory via jvp/vjp below).  Returns (M, MT) acting on flat
    vectors."""
    zero = jax.tree_util.tree_map(jnp.zeros_like, x0)

    def M(vflat):
        dv = _unflat(vflat, x0)
        _, out = _ad_jvp(traj_fn, (zero,), (dv,))
        return _flat(out)

    _, vjp_fn = _ad_vjp(traj_fn, zero)

    def MT(wflat):
        w = _unflat(wflat, traj_fn(zero))
        (out,) = vjp_fn(w)
        return _flat(out)

    return M, MT


def lanczos_singular_vectors(traj_fn, x0, nvec: int = 4, niter: int = 12,
                             seed: int = 0):
    """Finite-time singular values/vectors via Lanczos on M^T M
    (the FSV driver, fsv_roms.h).  Returns (sigma, vectors) with
    vectors as pytrees like x0."""
    M, MT = make_propagators(traj_fn, x0)
    n = _flat(x0).size
    key = jax.random.PRNGKey(seed)
    q = jax.random.normal(key, (n,), dtype=_flat(x0).dtype)
    q = q / jnp.linalg.norm(q)

    Q = [q]
    alphas, betas = [], []
    for j in range(niter):
        w = MT(M(Q[-1]))
        a = jnp.vdot(Q[-1], w)
        w = w - a * Q[-1]
        if j > 0:
            w = w - betas[-1] * Q[-2]
        # full reorthogonalization (small niter)
        for qq in Q:
            w = w - jnp.vdot(qq, w) * qq
        b = jnp.linalg.norm(w)
        alphas.append(float(a))
        betas.append(float(b))
        Q.append(w / jnp.maximum(b, 1e-30))

    T = np.diag(alphas) + np.diag(betas[:-1], 1) + np.diag(betas[:-1], -1)
    evals, evecs = np.linalg.eigh(T)
    order = np.argsort(evals)[::-1][:nvec]
    sigma = np.sqrt(np.maximum(evals[order], 0.0))
    Qm = jnp.stack(Q[:-1])                      # (niter, n)
    vecs = []
    for idx in order:
        v = jnp.einsum("i,in->n", jnp.asarray(evecs[:, idx]), Qm)
        vecs.append(_unflat(v / jnp.linalg.norm(v), x0))
    return sigma, vecs


def power_iteration_fte(traj_fn, x0, niter: int = 20, seed: int = 0):
    """Dominant finite-time eigenmode magnitude |lambda_1| of M via
    power iteration (FTE driver's leading mode)."""
    M, _ = make_propagators(traj_fn, x0)
    n = _flat(x0).size
    q = jax.random.normal(jax.random.PRNGKey(seed), (n,),
                          dtype=_flat(x0).dtype)
    q = q / jnp.linalg.norm(q)
    lam = 0.0
    for _ in range(niter):
        w = M(q)
        lam = jnp.linalg.norm(w)
        q = w / jnp.maximum(lam, 1e-30)
    return float(lam), _unflat(q, x0)


def _lanczos_sym(opA, n, dtype, nvec, niter, seed):
    """Lanczos eigensolve of a symmetric PSD operator on flat vectors."""
    key = jax.random.PRNGKey(seed)
    q = jax.random.normal(key, (n,), dtype=dtype)
    q = q / jnp.linalg.norm(q)
    Q = [q]
    alphas, betas = [], []
    for j in range(niter):
        w = opA(Q[-1])
        a = jnp.vdot(Q[-1], w)
        w = w - a * Q[-1]
        if j > 0:
            w = w - betas[-1] * Q[-2]
        for qq in Q:
            w = w - jnp.vdot(qq, w) * qq
        b = jnp.linalg.norm(w)
        alphas.append(float(a))
        betas.append(float(b))
        Q.append(w / jnp.maximum(b, 1e-30))
    T = np.diag(alphas) + np.diag(betas[:-1], 1) + np.diag(betas[:-1], -1)
    evals, evecs = np.linalg.eigh(T)
    order = np.argsort(evals)[::-1][:nvec]
    Qm = jnp.stack(Q[:-1])
    vecs = []
    for idx in order:
        v = jnp.einsum("i,in->n", jnp.asarray(evecs[:, idx]), Qm)
        vecs.append(v / jnp.linalg.norm(v))
    return evals[order], vecs


def optimal_perturbations(traj_fn, x0, nvec: int = 4, niter: int = 12,
                          seed: int = 0):
    """OP driver (propagator_op.h): singular vectors of the state
    propagator — identical operator to lanczos_singular_vectors, named
    per the reference taxonomy."""
    return lanczos_singular_vectors(traj_fn, x0, nvec, niter, seed)


def arnoldi_eigenmodes(traj_fn, x0, nvec: int = 4, niter: int = 20,
                       adjoint: bool = False, seed: int = 0):
    """FTE / AFTE drivers (propagator_fte.h / propagator_afte.h):
    Arnoldi iteration on M (or M^T) -> possibly complex Ritz values.

    Returns (eigenvalues complex (nvec,), ritz vectors as pytrees)."""
    M, MT = make_propagators(traj_fn, x0)
    op = MT if adjoint else M
    n = _flat(x0).size
    q = jax.random.normal(jax.random.PRNGKey(seed), (n,),
                          dtype=_flat(x0).dtype)
    Q = [q / jnp.linalg.norm(q)]
    H = np.zeros((niter + 1, niter))
    for j in range(niter):
        w = op(Q[j])
        for i in range(j + 1):
            H[i, j] = float(jnp.vdot(Q[i], w))
            w = w - H[i, j] * Q[i]
        H[j + 1, j] = float(jnp.linalg.norm(w))
        Q.append(w / max(H[j + 1, j], 1e-30))
    evals, evecs = np.linalg.eig(H[:niter, :niter])
    order = np.argsort(-np.abs(evals))[:nvec]
    Qm = np.asarray(jnp.stack(Q[:niter]))
    vecs = []
    for idx in order:
        v = np.real(np.einsum("i,in->n", evecs[:, idx], Qm))
        nrm = np.linalg.norm(v)
        vecs.append(_unflat(jnp.asarray(v / max(nrm, 1e-30)), x0))
    return evals[order], vecs


def forcing_singular_vectors(forced_traj_fn, f0, nvec: int = 4,
                             niter: int = 12, seed: int = 0):
    """FSV driver (propagator_fsv.h): singular vectors of the FORCING
    propagator.  forced_traj_fn maps a constant-in-time forcing
    perturbation pytree f to the final state perturbation (the caller
    integrates the trajectory adding f each step); Lanczos runs on
    Mf^T Mf."""
    Mf, MfT = make_propagators(forced_traj_fn, f0)
    n = _flat(f0).size
    evals, vecs = _lanczos_sym(lambda v: MfT(Mf(v)), n,
                               _flat(f0).dtype, nvec, niter, seed)
    sigma = np.sqrt(np.maximum(evals, 0.0))
    return sigma, [_unflat(v, f0) for v in vecs]


def stochastic_optimals(traj_fns, x0, nvec: int = 4, niter: int = 12,
                        seed: int = 0):
    """SO driver (propagator_so.h): eigenvectors of
    S = sum_t M_t^T M_t, the forcing patterns maximizing variance
    accumulated over the snapshot times.  traj_fns: list of
    perturbation->perturbation maps, one per snapshot time."""
    ops = [make_propagators(fn, x0) for fn in traj_fns]
    n = _flat(x0).size

    def S(v):
        acc = jnp.zeros_like(v)
        for M, MT in ops:
            acc = acc + MT(M(v))
        return acc

    evals, vecs = _lanczos_sym(S, n, _flat(x0).dtype, nvec, niter, seed)
    return evals, [_unflat(v, x0) for v in vecs]


def so_semi(traj_fns, x0, semi_mask, nvec: int = 4, niter: int = 12,
            seed: int = 0, times=None, decay: float = 0.0):
    """SO_SEMI driver (Drivers/so_semi_roms.h + propagator_so_semi.h,
    Moore et al. 2004): stochastic optimals with respect to the
    SEMINORM of a chosen functional — eigenvectors of

        S = sum_ij  c_ij  M_i^T G M_j

    where G projects onto the functional's support (the reference's
    Lstate/Fstate + KstrS:KendS space-time window become the pytree
    mask `semi_mask`, 1 inside the functional, 0 outside), and c_ij is
    the forcing temporal correlation: identity for SO_SEMI_WHITE, or
    exp(-|t_i - t_j| / decay) for red noise (SO_decay, read_phypar.F
    SO_decay*86400).

    traj_fns: one perturbation->perturbation map per snapshot time.
    Returns (eigenvalues, eigenvector pytrees)."""
    ops = [make_propagators(fn, x0) for fn in traj_fns]
    g = _flat(semi_mask)
    n = _flat(x0).size
    nt = len(traj_fns)
    if times is not None and decay and decay > 0.0:
        tt = np.asarray(times, np.float64)
        c = np.exp(-np.abs(tt[:, None] - tt[None, :]) / decay)
    else:
        c = np.eye(nt)

    def S(v):
        # Gv_j = G M_j v once per snapshot, then the correlated
        # adjoint sweep sum_i M_i^T (sum_j c_ij Gv_j)
        gv = [g * M(v) for M, _ in ops]
        acc = jnp.zeros_like(v)
        for i, (_, MT) in enumerate(ops):
            w = jnp.zeros_like(v)
            for j in range(nt):
                if c[i, j] != 0.0:
                    w = w + c[i, j] * gv[j]
            acc = acc + MT(g * w)
        return acc

    evals, vecs = _lanczos_sym(S, n, _flat(x0).dtype, nvec, niter,
                               seed)
    return evals, [_unflat(v, x0) for v in vecs]


def so_trace(traj_fns, x0, nsamples: int = 16, seed: int = 0):
    """SO-trace driver (propagator_so_trace.h): randomized Hutchinson
    estimate of trace(S) = E[z^T S z], z ~ Rademacher."""
    ops = [make_propagators(fn, x0) for fn in traj_fns]
    n = _flat(x0).size
    key = jax.random.PRNGKey(seed)
    acc = 0.0
    for s in range(nsamples):
        key, sub = jax.random.split(key)
        z = jax.random.rademacher(sub, (n,),
                                  dtype=_flat(x0).dtype)
        for M, MT in ops:
            acc += float(jnp.vdot(z, MT(M(z))))
    return acc / nsamples


def hessian_singular_vectors(hvp, template, nvec: int = 4,
                             niter: int = 12, seed: int = 0):
    """HOP driver (propagator_hop.h): Lanczos eigenpairs of a
    (preconditioned) 4D-Var Hessian given its vector product
    hvp(pytree) -> pytree."""
    n = _flat(template).size

    def op(v):
        return _flat(hvp(_unflat(v, template)))

    evals, vecs = _lanczos_sym(op, n, _flat(template).dtype, nvec,
                               niter, seed)
    return evals, [_unflat(v, template) for v in vecs]
