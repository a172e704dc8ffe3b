"""Fused equation-of-state Pallas kernel.

rho_eos is column-local: the JM95 polynomials, the top-down
rhoA/rhoS accumulations and the adiabatic-parcel Brunt-Vaisala
frequency all live along k.  The whole-array path materializes the two
reversed cumsums and the polynomial intermediates through HBM; this
kernel evaluates the entire routine per (8, 512) column block in VMEM
with the k accumulations unrolled.  Reuses the exact math of
core.rho_eos (same module functions traced on block values).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants
from ..core.rho_eos import _jm95_parts, rho_eos_linear


def rho_block(cfg, t, z_r, Hz, z_w):
    """core.rho_eos.rho_eos math on one block, with the reversed
    cumsums expressed as unrolled top-down loops (k static)."""
    N = t.shape[1]
    if cfg.eos.linear:
        rho = rho_eos_linear(cfg, t)
        pden = rho
        bvf_i = -(constants.g / cfg.rho0) * (pden[1:] - pden[:-1]) \
            / (z_r[1:] - z_r[:-1])
    else:
        _, _, _, den1, b0, b1, b2 = _jm95_parts(cfg, t)
        bulk = b0 - z_r * (b1 - z_r * b2)
        rho = den1 * bulk / (bulk + 0.1 * z_r) - 1000.0
        pden = den1 - 1000.0
        zw_i = z_w[1:-1]
        bulk_up = b0[1:] - zw_i * (b1[1:] - b2[1:] * zw_i)
        bulk_dn = b0[:-1] - zw_i * (b1[:-1] - b2[:-1] * zw_i)
        den_up = den1[1:] * bulk_up / (bulk_up + 0.1 * zw_i)
        den_dn = den1[:-1] * bulk_dn / (bulk_dn + 0.1 * zw_i)
        bvf_i = -constants.g * (den_up - den_dn) / \
            (0.5 * (den_up + den_dn) * (z_r[1:] - z_r[:-1]))

    # top-down accumulation (rho_eos.F:731-741), unrolled over k
    rhoA = rho[N - 1] * Hz[N - 1]
    rhoS = 0.5 * rhoA * Hz[N - 1]
    for k in range(N - 2, -1, -1):
        cff1 = rho[k] * Hz[k]
        rhoS = rhoS + Hz[k] * (rhoA + 0.5 * cff1)
        rhoA = rhoA + cff1
    D_inv = 1.0 / (z_w[N] - z_w[0])
    o_rho0 = 1.0 / cfg.rho0
    rhoA = o_rho0 * D_inv * rhoA
    rhoS = 2.0 * o_rho0 * D_inv * D_inv * rhoS

    zeros = jnp.zeros_like(bvf_i[:1])
    bvf = jnp.concatenate([zeros, bvf_i, zeros], axis=0)
    return rho, pden, rhoA, rhoS, bvf


def _kernel(cfg, t_ref, zr_ref, hz_ref, zw_ref,
            rho_ref, pden_ref, rhoA_ref, rhoS_ref, bvf_ref):
    rho, pden, rhoA, rhoS, bvf = rho_block(
        cfg, t_ref[...], zr_ref[...], hz_ref[...], zw_ref[...])
    rho_ref[...] = rho
    pden_ref[...] = pden
    rhoA_ref[...] = rhoA
    rhoS_ref[...] = rhoS
    bvf_ref[...] = bvf


def rho_eos_pallas(cfg, t, z_r, Hz, z_w, interpret: bool = False):
    """Drop-in for core.rho_eos.rho_eos on TPU."""
    N = z_r.shape[0]
    NT = t.shape[0]
    Mj, Li = z_r.shape[-2:]
    dtype = z_r.dtype
    BJ = 8
    BI = min(512, max(128, ((Li + 127) // 128) * 128))
    grid = (pl.cdiv(Mj, BJ), pl.cdiv(Li, BI))

    def spec(L, lead=None):
        if lead is None:
            return pl.BlockSpec((L, BJ, BI), lambda i, j: (0, i, j),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((lead, L, BJ, BI),
                            lambda i, j: (0, 0, i, j),
                            memory_space=pltpu.VMEM)

    spec2 = pl.BlockSpec((BJ, BI), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((N, Mj, Li), dtype),       # rho
        jax.ShapeDtypeStruct((N, Mj, Li), dtype),       # pden
        jax.ShapeDtypeStruct((Mj, Li), dtype),          # rhoA
        jax.ShapeDtypeStruct((Mj, Li), dtype),          # rhoS
        jax.ShapeDtypeStruct((N + 1, Mj, Li), dtype),   # bvf
    )
    return pl.pallas_call(
        functools.partial(_kernel, cfg),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[spec(N, lead=NT), spec(N), spec(N), spec(N + 1)],
        out_specs=(spec(N), spec(N), spec2, spec2, spec(N + 1)),
        interpret=interpret,
    )(t, z_r, Hz, z_w)


def use_pallas_rho(cfg=None) -> bool:
    """On for single-chip TPU (see ops.pallas_kpp.use_pallas_kpp)."""
    from .kernel_gate import pallas_enabled
    if not pallas_enabled():
        return False
    flag = os.environ.get("ROMS_TPU_PALLAS_RHO", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    from .kernel_gate import dtype_supported
    if cfg is not None and not dtype_supported(cfg.dtype):
        return False
    return jax.default_backend() == "tpu" and jax.device_count() == 1
