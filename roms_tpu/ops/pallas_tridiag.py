"""Pallas TPU kernel for the batched vertical tridiagonal solve.

The implicit vertical solves (viscosity, diffusion, TKE) are the model's
hottest latency-bound primitive: a Thomas sweep of ~N=30 sequential
steps over (Mj, Li) slabs.  The XLA `lax.scan` version streams each
plane through HBM twice per sweep; this kernel keeps the whole
(N, TJ, TI) column block resident in VMEM and runs both sweeps on the
VPU without intermediate HBM traffic.

The kernel tiles the horizontal plane on a 2-D grid; each program
instance solves TJ*TI independent columns.  Used via
`tridiag_solve_pallas`, a drop-in for ops.tridiag.tridiag_solve on TPU
(interpret=True makes it runnable on CPU for tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_TPU = True
except Exception:                      # pragma: no cover
    pltpu = None
    _HAS_TPU = False


def _thomas_kernel(lo_ref, dg_ref, up_ref, rhs_ref, out_ref, cp_ref,
                   dp_ref):
    """Forward elimination + back substitution, column block in VMEM."""
    N = lo_ref.shape[0]

    # k = 0
    inv0 = 1.0 / dg_ref[0]
    cp_ref[0] = up_ref[0] * inv0
    dp_ref[0] = rhs_ref[0] * inv0

    def fwd(k, _):
        denom = 1.0 / (dg_ref[k] - lo_ref[k] * cp_ref[k - 1])
        cp_ref[k] = up_ref[k] * denom
        dp_ref[k] = (rhs_ref[k] - lo_ref[k] * dp_ref[k - 1]) * denom
        return 0

    jax.lax.fori_loop(1, N, fwd, 0)

    out_ref[N - 1] = dp_ref[N - 1]

    def bwd(i, _):
        k = N - 2 - i
        out_ref[k] = dp_ref[k] - cp_ref[k] * out_ref[k + 1]
        return 0

    jax.lax.fori_loop(0, N - 1, bwd, 0)


def tridiag_solve_pallas(lower, diag, upper, rhs, tj: int = None,
                         ti: int = None, interpret: bool = False):
    if tj is None:
        import os
        tj = int(os.environ.get("ROMS_TPU_TRIDIAG_TJ", "8"))
        ti = int(os.environ.get("ROMS_TPU_TRIDIAG_TI", "512"))
    return _tridiag_solve_pallas(lower, diag, upper, rhs, tj, ti,
                                 interpret)


@functools.partial(jax.jit, static_argnames=("tj", "ti", "interpret"))
def _tridiag_solve_pallas(lower, diag, upper, rhs, tj: int = 8,
                          ti: int = 512, interpret: bool = False):
    """Solve tridiagonal systems along axis 0 of (N, Mj, Li) arrays.

    Same convention as ops.tridiag.tridiag_solve: lower[k] multiplies
    x[k-1] (lower[0] ignored), upper[k] multiplies x[k+1].  Horizontal
    dims are padded up to tile multiples.
    """
    N, Mj, Li = rhs.shape
    pj = (-Mj) % tj
    pi = (-Li) % ti

    def pad(x):
        # pad diag with ones to keep padded systems non-singular
        return jnp.pad(x, ((0, 0), (0, pj), (0, pi)))

    lo = pad(lower)
    dg = jnp.pad(diag, ((0, 0), (0, pj), (0, pi)), constant_values=1.0)
    up = pad(upper)
    rr = pad(rhs)
    Mjp, Lip = Mj + pj, Li + pi

    grid = (Mjp // tj, Lip // ti)
    block = pl.BlockSpec((N, tj, ti), lambda j, i: (0, j, i))
    if _HAS_TPU and not interpret:
        block = pl.BlockSpec((N, tj, ti), lambda j, i: (0, j, i),
                             memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((N, tj, ti), rhs.dtype),
                   pltpu.VMEM((N, tj, ti), rhs.dtype)]
    else:
        scratch = [pltpu.VMEM((N, tj, ti), rhs.dtype),
                   pltpu.VMEM((N, tj, ti), rhs.dtype)] if _HAS_TPU else []

    out = pl.pallas_call(
        _thomas_kernel,
        out_shape=jax.ShapeDtypeStruct((N, Mjp, Lip), rhs.dtype),
        grid=grid,
        in_specs=[block, block, block, block],
        out_specs=block,
        scratch_shapes=scratch,
        interpret=interpret,
    )(lo, dg, up, rr)
    return out[:, :Mj, :Li]
