"""Generalized stability theory (GST) analysis.

Re-designs the reference's propagator drivers + ARPACK reverse-
communication stack (Master/propagator.F:16-30, mod_storage.F:13-39,
afte/fte/fsv drivers) around autodiff: the tangent propagator is
jax.jvp of the trajectory map, its adjoint is jax.vjp, and the implicitly
restarted Arnoldi of ARPACK becomes an explicit Lanczos/Arnoldi
iteration on those operators.

Supported analyses:
  - FTE  (finite-time eigenmodes):       eigs of M
  - AFTE (adjoint eigenmodes):           eigs of M^T
  - FSV  (finite-time singular vectors): eigs of M^T M  (Lanczos)
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


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
        _, out = jax.jvp(traj_fn, (zero,), (dv,))
        return _flat(out)

    _, vjp_fn = jax.vjp(traj_fn, zero)

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
