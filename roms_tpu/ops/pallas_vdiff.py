"""Fused implicit vertical tracer diffusion (step3d_t SPLINES_VDIFF).

One kernel per (j-block, tracer) computes the whole solve chain of
core/step3d_t._vdiff_and_bc's splines branch: the Hz division, the
parabolic-spline coefficient assembly, the unrolled in-VMEM Thomas
sweep, and the flux-divergence update — column-local, zero HBM
intermediates (the jnp path materializes ~10 field-sized coefficient
arrays and streams two lax.scan sweeps through HBM).

The solver core is ops/pallas_uv._spline_dq — the identical routine
already hardware-validated for the momentum systems.  Tracer stacks
ride the (NT*N, Mj, Li) reshape of ops/pallas_tadv.py so every block
stays 3-D (4-D blocks crash the Mosaic emitter on ragged last
j-blocks).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_uv import _spline_dq


def _kernel(dt, hz_ref, ak_ref, q_ref, out_ref):
    Hz = hz_ref[...]
    Ak = ak_ref[...]
    q = q_ref[...] / Hz
    out_ref[...] = q + _spline_dq(Hz, Ak, q, dt)


def spline_vdiff_pallas(cfg, pre, Hz, Akt, interpret: bool = False):
    """All-tracer splines vertical diffusion.

    pre: list of NT Hz-weighted tracer fields (N, Mj, Li) — the
    pre-diffusion output of the advection step; Akt: (NAT, N+1, Mj, Li).
    Returns sol (NT, N, Mj, Li) in tracer units (q + dq), matching
    ops/tridiag.spline_flux_solve to solver-association ulps.
    """
    NT = cfg.NT
    N, Mj, Li = Hz.shape
    dtype = Hz.dtype
    NAT = Akt.shape[0]
    BJ = 8
    gj = pl.cdiv(Mj, BJ)

    q = jnp.stack(pre).reshape(NT * N, Mj, Li)
    Aks = jnp.stack([Akt[min(itrc, NAT - 1)] for itrc in range(NT)])
    Aks = Aks.reshape(NT * (N + 1), Mj, Li)

    def s_hz():
        return pl.BlockSpec((N, BJ, Li), lambda j, it: (0, j, 0),
                            memory_space=pltpu.VMEM)

    def s_t(L):
        return pl.BlockSpec((L, BJ, Li), lambda j, it: (it, j, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, float(cfg.dt)),
        out_shape=jax.ShapeDtypeStruct((NT * N, Mj, Li), dtype),
        grid=(gj, NT),
        in_specs=[s_hz(), s_t(N + 1), s_t(N)],
        out_specs=s_t(N),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(Hz, Aks, q)
    return out.reshape(NT, N, Mj, Li)


def use_pallas_vdiff(cfg) -> bool:
    from .kernel_gate import pallas_enabled
    if not pallas_enabled():
        return False
    if not cfg.mixing.splines_vdiff:
        return False
    flag = os.environ.get("ROMS_TPU_PALLAS_VDIFF", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    from .kernel_gate import dtype_supported
    if not dtype_supported(cfg.dtype):
        return False
    return jax.default_backend() == "tpu" and jax.device_count() == 1


def _interp():
    return os.environ.get("ROMS_TPU_PALLAS_VDIFF_INTERPRET", "") == "1"
