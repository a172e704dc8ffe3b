"""Fused LMD-KPP Pallas kernel.

The jnp implementation of the K-profile parameterization
(core/lmd.py: lmd_vmix_interior + lmd_skpp) fragments under XLA into
hundreds of unfused HBM passes (~12 GB accessed per BENCHMARK2 step,
measured) because the column physics mixes spline tridiagonal scans,
gathers at the boundary-layer index, and long elementwise chains.  KPP
is column-local: this kernel tiles the horizontal plane into
(BJ, BI) = (8, 256) blocks, holds every (k, j, i) working array in VMEM
and runs the entire closure — interior Ri mixing + surface boundary
layer + nonlocal transport — in ONE pass over the inputs
(~0.3 GB traffic, ~40x less).

Matches ROMS/Nonlinear/lmd_vmix.F + lmd_skpp.F exactly as core/lmd.py
does; the block math below is a transliteration of those whole-array
expressions with the lax.scan tridiagonals unrolled into a
three-RHS Thomas sweep and the take_along_axis gathers into
unrolled select-reductions (both column-local).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.lmd import (LMD_BETAT, LMD_BVFCON, LMD_CEKMAN,
                        LMD_CMONOB, LMD_CS, LMD_CSTAR, LMD_CV,
                        LMD_EPSILON, LMD_NU0C, LMD_NU0M, LMD_NU0S,
                        LMD_RI0, LMD_RIC,
                        _EPS, _SMALL, _MU1, _MU2, _R1, _wscale)
from .. import constants


import numpy as _np

_MU1_NP = _np.asarray(_MU1)
_MU2_NP = _np.asarray(_MU2)
_R1_NP = _np.asarray(_R1)


def _swdk(depth, jw: int):
    """swdk_frac with the Jerlov coefficients inlined as Python scalars
    (the module tables are jnp arrays, which a pallas kernel cannot
    capture as constants)."""
    i = jw - 1
    mu1 = float(_MU1_NP[i])
    mu2 = float(_MU2_NP[i])
    r1 = float(_R1_NP[i])
    return r1 * jnp.exp(-depth / mu1) + (1.0 - r1) * jnp.exp(-depth / mu2)


def _thomas_multi(lower, diag, upper, rhs_list):
    """Unrolled Thomas solve along axis 0 for several RHS sharing one
    matrix (the spline system factors once).  Semantics identical to
    ops.tridiag.tridiag_solve."""
    M = diag.shape[0]
    inv0 = 1.0 / diag[0]
    cp = [upper[0] * inv0]
    dps = [[r[0] * inv0] for r in rhs_list]
    for k in range(1, M):
        denom = 1.0 / (diag[k] - lower[k] * cp[k - 1])
        cp.append(upper[k] * denom)
        for dp, r in zip(dps, rhs_list):
            dp.append((r[k] - lower[k] * dp[k - 1]) * denom)
    outs = []
    for dp in dps:
        x = [None] * M
        x[M - 1] = dp[M - 1]
        for k in range(M - 2, -1, -1):
            x[k] = dp[k] - cp[k] * x[k + 1]
        outs.append(jnp.stack(x))
    return outs


def _gather_k(F, idx, K):
    """F[idx] along axis 0 as an unrolled select-reduction (column-local
    replacement for take_along_axis, which Mosaic cannot lower)."""
    out = jnp.zeros_like(F[0])
    for k in range(K):
        out = jnp.where(idx == k, F[k], out)
    return out


def kpp_block(p, u_r, v_r, pden, bvf, Hz, z_w,
              Ustar, Bo, Bosol, absf, flxT, flxS, srflx):
    """The full KPP column physics on one block of columns.

    p: dict of static parameters (N, NAT-independent backgrounds,
    jwtype).  All arrays are (levels, bj, bi) / (bj, bi) values.
    Returns (Akv, Akt_profile, ghT, ghS, hsbl).
    """
    N = p["N"]
    g = constants.g
    vonKar = constants.vonKar
    gorho0 = g / p["rho0"]
    jw = p["jwtype"]
    Vtc = LMD_CV * (-LMD_BETAT) ** 0.5 / \
        ((LMD_CS * LMD_EPSILON) ** 0.5 * LMD_RIC * vonKar ** 2)
    lmd_Cg = LMD_CSTAR * vonKar * \
        (LMD_CS * vonKar * LMD_EPSILON) ** (1.0 / 3.0)

    # ---- shared spline derivatives (one factorization, 3 RHS) ----------
    lo = Hz[1:-1]
    dg = 2.0 * (Hz[:-1] + Hz[1:])
    up = Hz[1:-1]
    zpad = jnp.zeros_like(lo[:1])
    lower = jnp.concatenate([zpad, lo], axis=0)
    upper = jnp.concatenate([up, zpad], axis=0)
    dR_i, dU_i, dV_i = _thomas_multi(
        lower, dg, upper,
        [6.0 * (pden[1:] - pden[:-1]),
         6.0 * (u_r[1:] - u_r[:-1]),
         6.0 * (v_r[1:] - v_r[:-1])])
    zz = jnp.zeros_like(dR_i[:1])
    dR = jnp.concatenate([zz, dR_i, zz], axis=0)      # (N+1,...)
    dU = jnp.concatenate([zz, dU_i, zz], axis=0)
    dV = jnp.concatenate([zz, dV_i, zz], axis=0)

    # ---- interior mixing (lmd_vmix.F + lmd_finish) ----------------------
    shear2 = dU_i * dU_i + dV_i * dV_i
    bvf_i = bvf[1:-1]
    Rig = bvf_i / (shear2 + _EPS)
    cff = jnp.minimum(1.0, jnp.maximum(0.0, Rig) / LMD_RI0)
    nu_sx = (1.0 - cff * cff) ** 3
    sh = bvf_i / (Rig + _EPS)
    nu_sx = nu_sx * sh * sh / (sh * sh + 16.0e-10)
    cffN = 1.0 / jnp.sqrt(jnp.maximum(bvf_i, 1.0e-7))
    Akv_i = 1.0e-6 * cffN + LMD_NU0M * nu_sx
    Akt_i = 1.0e-7 * cffN + LMD_NU0S * nu_sx
    cffc = jnp.maximum(bvf_i, LMD_BVFCON)
    cffc = jnp.minimum(1.0, (LMD_BVFCON - cffc) / LMD_BVFCON)
    nu_sxc = (1.0 - cffc * cffc) ** 3
    Akv_i = Akv_i + LMD_NU0C * nu_sxc
    Akt_i = Akt_i + LMD_NU0C * nu_sxc
    zk = jnp.full_like(Akv_i[:1], p["akv_bak"])
    zt = jnp.full_like(Akt_i[:1], p["akt_bak0"])
    Akv = jnp.concatenate([zk, Akv_i, zk], axis=0)
    Akt = jnp.concatenate([zt, Akt_i, zt], axis=0)

    # ---- surface buoyancy flux at interfaces -----------------------------
    depth_w = z_w[N][None] - z_w
    swdk_w = _swdk(depth_w, jw)
    Bflux = Bo[None] + Bosol[None] * (1.0 - swdk_w)

    # ---- bulk Richardson number (lmd_skpp.F) ----------------------------
    c3, c6 = 1.0 / 3.0, 1.0 / 6.0
    Rref = pden[N - 1] + Hz[N - 1] * (c3 * dR[N] + c6 * dR[N - 1])
    Uref = u_r[N - 1] + Hz[N - 1] * (c3 * dU[N] + c6 * dU[N - 1])
    Vref = v_r[N - 1] + Hz[N - 1] * (c3 * dV[N] + c6 * dV[N - 1])

    depth_k = z_w[N][None] - z_w[:-1]
    Bf_k = Bflux[:-1]
    sl_dpth0 = LMD_EPSILON * depth_k
    sigma = jnp.where(Bf_k < 0.0, jnp.minimum(sl_dpth0, depth_k),
                      depth_k)
    _, ws_k = _wscale(Ustar[None], vonKar * sigma * Bf_k, vonKar)

    Rk = pden - Hz * (c3 * dR[:-1] + c6 * dR[1:])
    Uk = u_r - Hz * (c3 * dU[:-1] + c6 * dU[1:])
    Vk = v_r - Hz * (c3 * dV[:-1] + c6 * dV[1:])
    Ritop = -gorho0 * (Rref[None] - Rk) * depth_k
    Ribot = (Uref[None] - Uk) ** 2 + (Vref[None] - Vk) ** 2 + \
        Vtc * depth_k * ws_k * jnp.sqrt(jnp.abs(bvf[:-1]))
    FC = Ritop / (Ribot + _EPS)
    FCfull = jnp.concatenate([FC, jnp.zeros_like(FC[:1])], axis=0)

    # first crossing scanning: largest k in [2..N] with FC[k]<Ric<=FC[k-1]
    izero = jnp.zeros_like(Ustar, jnp.int32)
    kcross = izero
    for k in range(2, N + 1):
        cond = (FCfull[k] < LMD_RIC) & (FCfull[k - 1] >= LMD_RIC)
        kcross = jnp.where(cond, jnp.int32(k), kcross)
    found = kcross >= 2
    ks = jnp.maximum(kcross, 1)

    FCk = _gather_k(FCfull, ks, N + 1)
    FCkm1 = _gather_k(FCfull, ks - 1, N + 1)
    zwk = _gather_k(z_w, ks, N + 1)
    zwkm1 = _gather_k(z_w, ks - 1, N + 1)
    hsbl_x = ((FCkm1 - LMD_RIC) * zwk + (LMD_RIC - FCk) * zwkm1) / \
        (FCkm1 - FCk + _SMALL)
    hsbl = jnp.where(found, hsbl_x, z_w[1])

    # ---- Ekman / Monin-Obukhov caps under stable forcing -----------------
    swdk_bl = _swdk(z_w[N] - hsbl, jw)
    Bfsfc = Bo + Bosol * (1.0 - swdk_bl)
    hekman = LMD_CEKMAN * Ustar / jnp.maximum(absf, _EPS)
    hmonob = LMD_CMONOB * Ustar ** 3 / \
        jnp.maximum(vonKar * Bfsfc, _EPS)
    cap = z_w[N] - jnp.minimum(jnp.minimum(hekman, hmonob),
                                z_w[N] - hsbl)
    hsbl = jnp.where((Ustar > 0.0) & (Bfsfc > 0.0), cap, hsbl)
    hsbl = jnp.clip(hsbl, z_w[0], z_w[N])

    # ksbl: number of interfaces z_w[0..N-1] strictly below hsbl
    ksbl = izero
    for k in range(N):
        ksbl = ksbl + (z_w[k] < hsbl).astype(jnp.int32)
    ksbl = jnp.maximum(ksbl, 1)

    # ---- boundary-layer scales and profile matching ----------------------
    swdk_bl = _swdk(z_w[N] - hsbl, jw)
    Bfsfc = Bo + Bosol * (1.0 - swdk_bl)
    zbl = z_w[N] - hsbl
    sl_dpth = LMD_EPSILON * zbl
    sig_bl = jnp.where(Bfsfc > 0.0, zbl, LMD_EPSILON * zbl)
    wm_bl, ws_bl = _wscale(Ustar, vonKar * sig_bl * Bfsfc, vonKar)
    f1 = 5.0 * jnp.maximum(0.0, Bfsfc) * vonKar / (Ustar ** 4 + _EPS)

    zw_ks = _gather_k(z_w, ksbl, N + 1)
    zw_ksm1 = _gather_k(z_w, ksbl - 1, N + 1)
    cffk = 1.0 / (zw_ks - zw_ksm1)
    cff_dn = cffk * (hsbl - zw_ksm1)
    cff_up = cffk * (zw_ks - hsbl)

    def match(K):
        K_at = _gather_k(K, ksbl, N + 1)
        K_at1 = _gather_k(K, ksbl - 1, N + 1)
        K_bl = cff_dn * K_at + cff_up * K_at1
        dK_bl = cffk * (K_at - K_at1)
        return K_bl, dK_bl

    Kv_bl, dKv_bl = match(Akv)
    Kv1 = Kv_bl / (zbl * wm_bl + _EPS)
    dKv1 = jnp.minimum(0.0, -dKv_bl / (wm_bl + _EPS) - Kv_bl * f1)
    Kt_bl, dKt_bl = match(Akt)
    Kt1 = Kt_bl / (zbl * ws_bl + _EPS)
    dKt1 = jnp.minimum(0.0, -dKt_bl / (ws_bl + _EPS) - Kt_bl * f1)

    # ---- interior overwrite with shape-function profile ------------------
    kif = jax.lax.broadcasted_iota(jnp.int32, (N - 1, 1, 1), 0) + 1
    inside = kif > ksbl[None]
    depth_i = z_w[N][None] - z_w[1:-1]
    Bf_i = Bflux[1:-1]
    sigma_i = jnp.where(Bf_i < 0.0,
                        jnp.minimum(sl_dpth[None], depth_i), depth_i)
    wm_i, ws_i = _wscale(Ustar[None], vonKar * sigma_i * Bf_i, vonKar)
    sig = depth_i / (zbl[None] + _EPS)
    a1 = sig - 2.0
    a2 = 3.0 - 2.0 * sig
    a3 = sig - 1.0
    Gm = a1 + a2 * Kv1[None] + a3 * dKv1[None]
    Akv_bl = depth_i * wm_i * (1.0 + sig * Gm)
    Akv_out = jnp.concatenate(
        [Akv[:1], jnp.where(inside, Akv_bl, Akv[1:-1]), Akv[-1:]],
        axis=0)
    Gt = a1 + a2 * Kt1[None] + a3 * dKt1[None]
    Akt_bl = depth_i * ws_i * (1.0 + sig * Gt)
    Akt_out = jnp.concatenate(
        [Akt[:1], jnp.where(inside, Akt_bl, Akt[1:-1]), Akt[-1:]],
        axis=0)

    # ---- nonlocal transport (LMD_NONLOCAL) -------------------------------
    unstable = Bf_i < 0.0
    cff_nl = lmd_Cg / (zbl[None] * ws_i + _EPS)
    ghT_i = jnp.where(inside & unstable,
                      -cff_nl * (flxT[None]
                                 + srflx[None] * (1.0 - swdk_w[1:-1])),
                      0.0)
    ghS_i = jnp.where(inside & unstable, cff_nl * flxS[None], 0.0)
    pads = jnp.zeros_like(ghT_i[:1])
    ghT = jnp.concatenate([pads, ghT_i, pads], axis=0)
    ghS = jnp.concatenate([pads, ghS_i, pads], axis=0)

    return Akv_out, Akt_out, ghT, ghS, hsbl


def _kernel(p, ur_ref, vr_ref, pden_ref, bvf_ref, hz_ref, zw_ref,
            ustar_ref, bo_ref, bosol_ref, absf_ref, flxT_ref, flxS_ref,
            srflx_ref,
            akv_ref, akt_ref, ghT_ref, ghS_ref, hsbl_ref):
    Akv, Akt, ghT, ghS, hsbl = kpp_block(
        p, ur_ref[...], vr_ref[...], pden_ref[...], bvf_ref[...],
        hz_ref[...], zw_ref[...], ustar_ref[...], bo_ref[...],
        bosol_ref[...], absf_ref[...], flxT_ref[...], flxS_ref[...],
        srflx_ref[...])
    akv_ref[...] = Akv
    akt_ref[...] = Akt
    ghT_ref[...] = ghT
    ghS_ref[...] = ghS
    hsbl_ref[...] = hsbl


def kpp_pallas(cfg, u_r, v_r, pden, bvf, Hz, z_w, Ustar, Bo, Bosol,
               absf, flxT, flxS, srflx, jwtype: int = 1,
               interpret: bool = False):
    """pallas_call wrapper: returns (Akv, Akt_profile, ghT, ghS, hsbl)."""
    N = cfg.N
    Mj, Li = u_r.shape[-2:]
    dtype = u_r.dtype
    BJ = 8
    BI = min(256, max(128, ((Li + 127) // 128) * 128))
    grid = (pl.cdiv(Mj, BJ), pl.cdiv(Li, BI))

    p = dict(N=N, rho0=cfg.rho0, akv_bak=cfg.mixing.akv_bak,
             akt_bak0=cfg.mixing.akt_bak[0], jwtype=jwtype)

    def spec3(L):
        return pl.BlockSpec((L, BJ, BI), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)

    spec2 = pl.BlockSpec((BJ, BI), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((N + 1, Mj, Li), dtype),   # Akv
        jax.ShapeDtypeStruct((N + 1, Mj, Li), dtype),   # Akt profile
        jax.ShapeDtypeStruct((N + 1, Mj, Li), dtype),   # ghT
        jax.ShapeDtypeStruct((N + 1, Mj, Li), dtype),   # ghS
        jax.ShapeDtypeStruct((Mj, Li), dtype),          # hsbl
    )
    out_specs = (spec3(N + 1), spec3(N + 1), spec3(N + 1), spec3(N + 1),
                 spec2)
    in_specs = [spec3(N), spec3(N), spec3(N), spec3(N + 1), spec3(N),
                spec3(N + 1), spec2, spec2, spec2, spec2, spec2, spec2,
                spec2]

    return pl.pallas_call(
        functools.partial(_kernel, p),
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(u_r, v_r, pden, bvf, Hz, z_w, Ustar, Bo, Bosol, absf, flxT,
      flxS, srflx)


def lmd_kpp_fused(cfg, grid, t, u, v, pden, bvf, Hz, z_r, z_w, forcing,
                  interpret: bool = False):
    """Drop-in replacement for lmd_vmix_interior + lmd_skpp (the
    BENCHMARK physics path, no BKPP): returns (Akv, Akt, ghats, hsbl)
    with Akt stacked over NAT like core.lmd does."""
    from ..core.lmd import _alpha_beta
    from ..ops import stencil as st
    g = constants.g

    sustr, svstr = forcing.sustr, forcing.svstr
    taux_r = 0.5 * (sustr + st.ip1(sustr))
    tauy_r = 0.5 * (svstr + st.jp1(svstr))
    from .fastmath import pow14
    Ustar = pow14(taux_r ** 2 + tauy_r ** 2)
    alpha, beta = _alpha_beta(cfg, t)
    stflx, srflx = forcing.stflx, forcing.srflx
    if cfg.NT > 1:
        Bo = g * (alpha * (stflx[0] - srflx) - beta * stflx[1])
        flxS = stflx[1]
    else:
        Bo = g * alpha * (stflx[0] - srflx)
        flxS = jnp.zeros_like(srflx)
    Bosol = g * alpha * srflx
    u_r = 0.5 * (u + st.ip1(u))
    v_r = 0.5 * (v + st.jp1(v))

    Akv, Akt_prof, ghT, ghS, hsbl = kpp_pallas(
        cfg, u_r, v_r, pden, bvf, Hz, z_w, Ustar, Bo, Bosol,
        jnp.abs(grid.f), stflx[0] - srflx, flxS, srflx,
        jwtype=cfg.mixing.jwtype, interpret=interpret)
    Akt = jnp.stack([Akt_prof] * cfg.NAT)
    if cfg.NAT > 1:
        ghats = jnp.stack([ghT, ghS])
    else:
        ghats = ghT[None]
    return Akv, Akt, ghats, hsbl


def use_pallas_kpp(cfg=None) -> bool:
    """Trace-time switch: on for single-chip TPU unless overridden.

    pallas_call is opaque to GSPMD, so under a multi-device mesh the
    default stays with the partitionable whole-array path (a sharded
    pallas path needs shard_map plumbing — round 3)."""
    from .kernel_gate import pallas_enabled
    if not pallas_enabled():
        return False
    flag = os.environ.get("ROMS_TPU_PALLAS_KPP", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    from .kernel_gate import dtype_supported
    if cfg is not None and not dtype_supported(cfg.dtype):
        return False
    return jax.default_backend() == "tpu" and jax.device_count() == 1
