"""Fused harmonic momentum-mixing Pallas kernel (uv3dmix2_s.h).

One VMEM pass per j-block computes core/hmix.uv3dmix2_s
(ROMS/Nonlinear/uv3dmix2_s.h:120-222): the rho-point and psi-point
stress components, their divergence, the dt-weighted update of the
momentum corrector seeds, and the vertical sum feeding the 2D coupling
forcing (rufrc/rvfrc) — reading u/v/Hz once instead of materializing
the four stress arrays in HBM.

Mechanics are the ext-window patterns of ops/pallas_prsgrd.py: every
stencil input arrives as a (center, minus, plus) block triple stitched
on the row axis, the chain is evaluated over the window (consumed
depth <= 2 rows), and only the center BJ rows are stored.  Gated to
EW-periodic, non-NS-periodic grids with constant visc2 (the
Smagorinsky DIFF_3DCOEF variant falls back to jnp).  Output ring rows
j = 0 / Mj-1 keep the incoming seed values untouched (the jnp path's
stress wrap rows are dead data the BCs overwrite; proven by the
trajectory test in tests/test_pallas_uvmix.py).
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


_G2D = ("pn", "pm", "pmon_r", "pnom_r", "on_r", "om_r",
        "pmon_p", "pnom_p", "on_p", "om_p", "pmask",
        "visc2_r", "visc2_p")


def _kernel(Li, Mj, BJ, dt, ew, *refs):
    k = 0

    def ext(n3):
        nonlocal k
        c, m, p = refs[k][...], refs[k + 1][...], refs[k + 2][...]
        k += 3
        return jnp.concatenate([m, c, p], axis=1 if n3 else 0)

    u = ext(True)
    v = ext(True)
    Hz = ext(True)
    G = {}
    for name in _G2D:
        G[name] = ext(False)
    up_c = refs[k][...]         # u_part center (N, BJ, Li)
    vp_c = refs[k + 1][...]
    ruf_c = refs[k + 2][...]    # rufrc center (BJ, Li)
    rvf_c = refs[k + 3][...]
    out_up, out_vp, out_ruf, out_rvf = refs[k + 4:k + 8]

    pn, pm = G["pn"], G["pm"]
    upn = pn + _im1(pn)
    upm = pm + _im1(pm)
    vpn = pn + _sh_j(pn, -1)
    vpm = pm + _sh_j(pm, -1)

    # rho-point stress (diagonal)
    cff_r = Hz * 0.5 * (G["pmon_r"] * (_ip1(upn * u) - upn * u)
                        - G["pnom_r"] * (_sh_j(vpm * v, 1) - vpm * v))
    UFx = G["on_r"] * G["on_r"] * G["visc2_r"] * cff_r
    VFe = G["om_r"] * G["om_r"] * G["visc2_r"] * cff_r
    # psi-point stress (off-diagonal)
    Hz_p = 0.25 * (Hz + _im1(Hz) + _sh_j(Hz, -1) + _im1(_sh_j(Hz, -1)))
    cff_p = 0.5 * Hz_p * (G["pmon_p"] * (vpn * v - _im1(vpn * v))
                          + G["pnom_p"] * (upm * u
                                           - _sh_j(upm * u, -1))) \
        * G["pmask"]
    UFe = G["om_p"] * G["om_p"] * G["visc2_p"] * cff_p
    VFx = G["on_p"] * G["on_p"] * G["visc2_p"] * cff_p
    if ew:
        UFx = _perx(UFx, Li)
        VFe = _perx(VFe, Li)
        UFe = _perx(UFe, Li)
        VFx = _perx(VFx, Li)

    div_u = 0.5 * upn * (UFx - _im1(UFx)) \
        + 0.5 * upm * (_sh_j(UFe, 1) - UFe)
    div_v = 0.5 * vpn * (_ip1(VFx) - VFx) \
        - 0.5 * vpm * (VFe - _sh_j(VFe, -1))

    ctr = functools.partial(jax.lax.slice_in_dim, start_index=BJ,
                            limit_index=2 * BJ, axis=1)
    du = ctr(div_u)
    dv = ctr(div_v)
    upm_c = jax.lax.slice_in_dim(upm, BJ, 2 * BJ, axis=0)
    upn_c = jax.lax.slice_in_dim(upn, BJ, 2 * BJ, axis=0)
    vpm_c = jax.lax.slice_in_dim(vpm, BJ, 2 * BJ, axis=0)
    vpn_c = jax.lax.slice_in_dim(vpn, BJ, 2 * BJ, axis=0)

    grow3 = (jax.lax.broadcasted_iota(jnp.int32, du.shape, 1)
             + pl.program_id(0) * BJ)
    ring3 = (grow3 == 0) | (grow3 >= Mj - 1)
    du = jnp.where(ring3, 0.0, du)
    dv = jnp.where(ring3, 0.0, dv)

    out_up[...] = up_c + dt * 0.25 * upm_c * upn_c * du
    out_vp[...] = vp_c + dt * 0.25 * vpm_c * vpn_c * dv
    out_ruf[...] = ruf_c + jnp.sum(du, axis=0)
    out_rvf[...] = rvf_c + jnp.sum(dv, axis=0)


def uv3dmix2_s_pallas(cfg, grid, u, v, u_part, v_part, Hz, rufrc,
                      rvfrc, interpret: bool = False):
    """Drop-in for core/hmix.uv3dmix2_s on the gated config class.

    Note on ring rows: the kernel leaves u_part/v_part and rufrc/rvfrc
    UNCHANGED at j = 0 / Mj-1 (adds zero), while the jnp path adds the
    roll-wrap stress there — dead data in both cases."""
    N, Mj, Li = u.shape
    dtype = u.dtype
    BJ = 8
    gj = pl.cdiv(Mj, BJ)

    def s3(off):
        if off < 0:
            return pl.BlockSpec((N, BJ, Li),
                                lambda j: (0, jnp.maximum(j - 1, 0), 0),
                                memory_space=pltpu.VMEM)
        if off > 0:
            return pl.BlockSpec(
                (N, BJ, Li), lambda j: (0, jnp.minimum(j + 1, gj - 1), 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec((N, BJ, Li), lambda j: (0, j, 0),
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

    args, specs = [], []
    for x in (u, v, Hz):
        args += [x, x, x]
        specs += [s3(0), s3(-1), s3(1)]
    for name in _G2D:
        f = getattr(grid, name).astype(dtype)
        args += [f, f, f]
        specs += [s2(0), s2(-1), s2(1)]
    args += [u_part, v_part, rufrc, rvfrc]
    specs += [s3(0), s3(0), s2(0), s2(0)]

    out_up, out_vp, out_ruf, out_rvf = pl.pallas_call(
        functools.partial(_kernel, Li, Mj, BJ, float(cfg.dt),
                          bool(cfg.bc.ew_periodic)),
        out_shape=(jax.ShapeDtypeStruct((N, Mj, Li), dtype),
                   jax.ShapeDtypeStruct((N, Mj, Li), dtype),
                   jax.ShapeDtypeStruct((Mj, Li), dtype),
                   jax.ShapeDtypeStruct((Mj, Li), dtype)),
        grid=(gj,),
        in_specs=specs,
        out_specs=(s3(0), s3(0), s2(0), s2(0)),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*args)
    return out_up, out_vp, out_ruf, out_rvf


def use_pallas_uvmix(cfg) -> bool:
    from .kernel_gate import pallas_enabled
    if not pallas_enabled():
        return False
    if not cfg.bc.ew_periodic or cfg.bc.ns_periodic:
        return False
    flag = os.environ.get("ROMS_TPU_PALLAS_UVMIX", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    from .kernel_gate import dtype_supported
    if not dtype_supported(cfg.dtype):
        return False
    return jax.default_backend() == "tpu" and jax.device_count() == 1


def _interp():
    return os.environ.get("ROMS_TPU_PALLAS_UVMIX_INTERPRET", "") == "1"
