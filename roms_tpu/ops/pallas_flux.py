"""Fused mass-flux + continuity Pallas kernel (set_massflux + omega).

Two entry points sharing one kernel:

  * ``flux_omega_pallas`` — set_massflux.F:140-163 (Huon/Hvom with the
    EW ring refresh) fused with omega.F's bottom-up continuity integral,
    S-surface drift correction and rho-point BCs, reading u/v/Hz/z_w
    once per j-block;
  * ``omega_pallas`` — the omega part alone for the corrector site
    where step3d_uv already produced the fluxes.

The vertical integral W[k] = -sum_{m<=k} div[m] unrolls over the static
N levels in VMEM with jnp.cumsum's sequential association (no HBM scan
carries).  Gated to the EW-periodic / non-NS-periodic channel class
with closed-or-gradient N/S zeta BCs; point sources and OMEGA_IMPLICIT
fall back to jnp.  Output ring behavior: W rows 0/Mj-1 carry the real
BC copies; Huon/Hvom ring rows hold different dead garbage than the jnp
path's roll wrap (every consumer's BCs overwrite them — trajectory test
in tests/test_pallas_flux.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iota_l(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _roll(x, s):
    return pltpu.roll(x, s % x.shape[-1], axis=x.ndim - 1)


def _im1(x):
    return _roll(x, 1)


def _ip1(x):
    return _roll(x, -1)


def _sh_j(x, s):
    ax = x.ndim - 2
    L = x.shape[ax]
    if s < 0:
        return jnp.concatenate(
            [jax.lax.slice_in_dim(x, L + s, L, axis=ax),
             jax.lax.slice_in_dim(x, 0, L + s, axis=ax)], axis=ax)
    return jnp.concatenate(
        [jax.lax.slice_in_dim(x, s, L, axis=ax),
         jax.lax.slice_in_dim(x, 0, s, axis=ax)], axis=ax)


def _perx(x, Li):
    i = _iota_l(x.shape)
    x = jnp.where(i == 0, _roll(x, -(Li - 2)), x)
    return jnp.where(i == Li - 1, _roll(x, Li - 2), x)


def _kernel(Li, Mj, BJ, with_flux, *refs):
    k = 0

    def ext(n3):
        nonlocal k
        c, m, p = refs[k][...], refs[k + 1][...], refs[k + 2][...]
        k += 3
        return jnp.concatenate([m, c, p], axis=1 if n3 else 0)

    if with_flux:
        u = ext(True)
        v = ext(True)
        Hz = ext(True)
        z_w = ext(True)
        on_u = ext(False)
        om_v = ext(False)
        out_hu, out_hv, out_w = refs[k:k + 3]
        Huon = 0.5 * (Hz + _im1(Hz)) * u * on_u
        Hvom = 0.5 * (Hz + _sh_j(Hz, -1)) * v * om_v
        Huon = _perx(Huon, Li)
        Hvom = _perx(Hvom, Li)
    else:
        Huon = ext(True)
        Hvom = ext(True)
        z_w = ext(True)
        out_w = refs[k]

    N = Huon.shape[0]
    div = (_ip1(Huon) - Huon) + (_sh_j(Hvom, 1) - Hvom)
    # W[k] = -cumsum(div)[k], sequential association
    planes = []
    acc = None
    for kk in range(N):
        acc = div[kk] if acc is None else acc + div[kk]
        planes.append(-acc)
    zeros = jnp.zeros_like(planes[0])
    W = jnp.stack([zeros] + planes, axis=0)          # (N+1, 3BJ, Li)

    wrk = W[N] / (z_w[N] - z_w[0])
    W = W - wrk[None] * (z_w - z_w[0:1])
    W = jnp.concatenate([W[0:N], jnp.zeros_like(W[0:1])], axis=0)

    # bc_rho for closed/gradient N/S + EW-periodic (boundary.bc_rho)
    grow = (jax.lax.broadcasted_iota(jnp.int32, W.shape, 1)
            + pl.program_id(0) * BJ - BJ)
    W = jnp.where(grow == 0, _sh_j(W, 1), W)
    W = jnp.where(grow == Mj - 1, _sh_j(W, -1), W)
    W = _perx(W, Li)

    def ctr(x):
        return jax.lax.slice_in_dim(x, BJ, 2 * BJ, axis=1)

    if with_flux:
        out_hu[...] = ctr(Huon)
        out_hv[...] = ctr(Hvom)
    out_w[...] = ctr(W)


def _specs(N, Mj, Li, BJ, gj):
    def s3(L, off):
        if off < 0:
            return pl.BlockSpec((L, BJ, Li),
                                lambda j: (0, jnp.maximum(j - 1, 0), 0),
                                memory_space=pltpu.VMEM)
        if off > 0:
            return pl.BlockSpec(
                (L, BJ, Li), lambda j: (0, jnp.minimum(j + 1, gj - 1), 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec((L, BJ, Li), lambda j: (0, j, 0),
                            memory_space=pltpu.VMEM)

    def s2(off):
        if off < 0:
            return pl.BlockSpec((BJ, Li),
                                lambda j: (jnp.maximum(j - 1, 0), 0),
                                memory_space=pltpu.VMEM)
        if off > 0:
            return pl.BlockSpec(
                (BJ, Li), lambda j: (jnp.minimum(j + 1, gj - 1), 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec((BJ, Li), lambda j: (j, 0),
                            memory_space=pltpu.VMEM)
    return s3, s2


def flux_omega_pallas(cfg, grid, u, v, Hz, z_w,
                      interpret: bool = False):
    """Returns (Huon, Hvom, W) — set_massflux + periodic_x + omega."""
    N, Mj, Li = u.shape
    dtype = u.dtype
    BJ = 8
    gj = pl.cdiv(Mj, BJ)
    s3, s2 = _specs(N, Mj, Li, BJ, gj)

    args, specs = [], []
    for x, L in ((u, N), (v, N), (Hz, N), (z_w, N + 1)):
        args += [x, x, x]
        specs += [s3(L, 0), s3(L, -1), s3(L, 1)]
    for f in (grid.on_u, grid.om_v):
        f = f.astype(dtype)
        args += [f, f, f]
        specs += [s2(0), s2(-1), s2(1)]

    return pl.pallas_call(
        functools.partial(_kernel, Li, Mj, BJ, True),
        out_shape=(jax.ShapeDtypeStruct((N, Mj, Li), dtype),
                   jax.ShapeDtypeStruct((N, Mj, Li), dtype),
                   jax.ShapeDtypeStruct((N + 1, Mj, Li), dtype)),
        grid=(gj,),
        in_specs=specs,
        out_specs=(s3(N, 0), s3(N, 0), s3(N + 1, 0)),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*args)


def omega_pallas(cfg, grid, Huon, Hvom, z_w, interpret: bool = False):
    """Returns W alone (corrector site; fluxes already final)."""
    N, Mj, Li = Huon.shape
    dtype = Huon.dtype
    BJ = 8
    gj = pl.cdiv(Mj, BJ)
    s3, _ = _specs(N, Mj, Li, BJ, gj)

    args, specs = [], []
    for x, L in ((Huon, N), (Hvom, N), (z_w, N + 1)):
        args += [x, x, x]
        specs += [s3(L, 0), s3(L, -1), s3(L, 1)]

    return pl.pallas_call(
        functools.partial(_kernel, Li, Mj, BJ, False),
        out_shape=jax.ShapeDtypeStruct((N + 1, Mj, Li), dtype),
        grid=(gj,),
        in_specs=specs,
        out_specs=s3(N + 1, 0),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*args)


def use_pallas_flux(cfg) -> bool:
    from .kernel_gate import pallas_enabled
    if not pallas_enabled():
        return False
    from ..config import CLOSED, GRADIENT
    if not cfg.bc.ew_periodic or cfg.bc.ns_periodic:
        return False
    z = cfg.bc.zeta
    if z.south not in (CLOSED, GRADIENT) or \
            z.north not in (CLOSED, GRADIENT):
        return False
    if cfg.omega_implicit:
        return False
    flag = os.environ.get("ROMS_TPU_PALLAS_FLUX", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    from .kernel_gate import dtype_supported
    if not dtype_supported(cfg.dtype):
        return False
    return jax.default_backend() == "tpu" and jax.device_count() == 1


def _interp():
    return os.environ.get("ROMS_TPU_PALLAS_FLUX_INTERPRET", "") == "1"
