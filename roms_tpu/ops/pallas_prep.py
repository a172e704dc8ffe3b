"""Fused prep-chain Pallas kernel: rho_eos + LMD-KPP in ONE launch.

The round-4 phase analysis (BASELINE.md) left one untested lever: the
prep column chain rho_eos -> bulk_flux -> KPP writes pden and bvf to
HBM only for the KPP kernel to read them straight back (2 field-sized
round trips ~ 256 MB at BENCHMARK3), plus both kernels separately read
t/Hz/z_w.  This module fuses the two column kernels (reusing the exact
block bodies `pallas_rho.rho_block` and `pallas_kpp.kpp_block`, so the
math — and the f32 op order — is identical to the unfused pair): pden
and bvf never leave VMEM, and bvf is not materialized at all (in the
KPP path nothing downstream of the closure consumes it; GLS runs take
the unfused path).

The bulk-flux kernel sits BETWEEN the two in dataflow (it needs the
surface rho for air density, and KPP needs the resulting fluxes), so
the step computes the surface rho level standalone (`surface_rho`, a
2-D JM95 evaluation — identical bits to rho[-1] of the full kernel)
before calling the forcing function, then runs this fused kernel.

Reference chain: rho_eos.F -> bulk_flux.F -> lmd_vmix.F/lmd_skpp.F
(main3d.F:348-529).
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
from .pallas_kpp import kpp_block
from .pallas_rho import rho_block


def surface_rho(cfg, t, z_r):
    """rho at the top rho level only (the bulk-flux air-density input;
    bitwise identical to rho_eos(...)[0][-1] in f32)."""
    ts = t[:, -1]
    if cfg.eos.linear:
        return rho_eos_linear(cfg, ts[:, None])[0]
    _, _, _, den1, b0, b1, b2 = _jm95_parts(cfg, ts)
    zs = z_r[-1]
    bulk = b0 - zs * (b1 - zs * b2)
    return den1 * bulk / (bulk + 0.1 * zs) - 1000.0


def _kernel(cfg, p, t_ref, zr_ref, hz_ref, zw_ref, ur_ref, vr_ref,
            ustar_ref, bo_ref, bosol_ref, absf_ref, flxT_ref, flxS_ref,
            srflx_ref,
            rho_ref, pden_ref, rhoA_ref, rhoS_ref,
            akv_ref, akt_ref, ghT_ref, ghS_ref, hsbl_ref):
    hz = hz_ref[...]
    zw = zw_ref[...]
    rho, pden, rhoA, rhoS, bvf = rho_block(
        cfg, t_ref[...], zr_ref[...], hz, zw)
    Akv, Akt, ghT, ghS, hsbl = kpp_block(
        p, ur_ref[...], vr_ref[...], pden, bvf, hz, zw,
        ustar_ref[...], bo_ref[...], bosol_ref[...], absf_ref[...],
        flxT_ref[...], flxS_ref[...], srflx_ref[...])
    rho_ref[...] = rho
    pden_ref[...] = pden
    rhoA_ref[...] = rhoA
    rhoS_ref[...] = rhoS
    akv_ref[...] = Akv
    akt_ref[...] = Akt
    ghT_ref[...] = ghT
    ghS_ref[...] = ghS
    hsbl_ref[...] = hsbl


def prep_pallas(cfg, t, z_r, Hz, z_w, u_r, v_r, Ustar, Bo, Bosol,
                absf, flxT, flxS, srflx, jwtype: int = 1,
                interpret: bool = False):
    """pallas_call wrapper: returns
    (rho, pden, rhoA, rhoS, Akv, Akt_profile, ghT, ghS, hsbl)."""
    N = cfg.N
    NT = t.shape[0]
    Mj, Li = u_r.shape[-2:]
    dtype = u_r.dtype
    BJ = 8
    BI = min(256, max(128, ((Li + 127) // 128) * 128))
    grid = (pl.cdiv(Mj, BJ), pl.cdiv(Li, BI))

    p = dict(N=N, rho0=cfg.rho0, akv_bak=cfg.mixing.akv_bak,
             akt_bak0=cfg.mixing.akt_bak[0], jwtype=jwtype)

    def spec3(L, lead=None):
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
        jax.ShapeDtypeStruct((N + 1, Mj, Li), dtype),   # Akv
        jax.ShapeDtypeStruct((N + 1, Mj, Li), dtype),   # Akt profile
        jax.ShapeDtypeStruct((N + 1, Mj, Li), dtype),   # ghT
        jax.ShapeDtypeStruct((N + 1, Mj, Li), dtype),   # ghS
        jax.ShapeDtypeStruct((Mj, Li), dtype),          # hsbl
    )
    out_specs = (spec3(N), spec3(N), spec2, spec2,
                 spec3(N + 1), spec3(N + 1), spec3(N + 1), spec3(N + 1),
                 spec2)
    in_specs = [spec3(N, lead=NT), spec3(N), spec3(N), spec3(N + 1),
                spec3(N), spec3(N),
                spec2, spec2, spec2, spec2, spec2, spec2, spec2]

    return pl.pallas_call(
        functools.partial(_kernel, cfg, p),
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(t, z_r, Hz, z_w, u_r, v_r, Ustar, Bo, Bosol, absf, flxT, flxS,
      srflx)


def prep_fused(cfg, grid, t, u, v, Hz, z_r, z_w, forcing,
               interpret: bool = False):
    """Drop-in replacement for rho_eos + lmd_vmix_interior + lmd_skpp
    (the BENCHMARK physics path, no BKPP/DDMIX): returns
    (rho, pden, rhoA, rhoS, Akv, Akt, ghats, hsbl) with Akt stacked
    over NAT like core.lmd does.  Same outer staggering/flux prep as
    ops.pallas_kpp.lmd_kpp_fused so results match it bitwise."""
    from ..core.lmd import _alpha_beta
    from ..ops import stencil as st
    from .fastmath import pow14
    g = constants.g

    sustr, svstr = forcing.sustr, forcing.svstr
    taux_r = 0.5 * (sustr + st.ip1(sustr))
    tauy_r = 0.5 * (svstr + st.jp1(svstr))
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

    (rho, pden, rhoA, rhoS, Akv, Akt_prof, ghT, ghS, hsbl) = prep_pallas(
        cfg, t, z_r, Hz, z_w, u_r, v_r, Ustar, Bo, Bosol,
        jnp.abs(grid.f), stflx[0] - srflx, flxS, srflx,
        jwtype=cfg.mixing.jwtype, interpret=interpret)
    Akt = jnp.stack([Akt_prof] * cfg.NAT)
    if cfg.NAT > 1:
        ghats = jnp.stack([ghT, ghS])
    else:
        ghats = ghT[None]
    return rho, pden, rhoA, rhoS, Akv, Akt, ghats, hsbl


def use_pallas_prep(cfg=None) -> bool:
    """Trace-time switch (see ops.pallas_kpp.use_pallas_kpp): on for
    single-chip TPU when both constituent kernels are enabled."""
    flag = os.environ.get("ROMS_TPU_PALLAS_PREP", "")
    if flag == "0":
        return False
    from .pallas_kpp import use_pallas_kpp
    from .pallas_rho import use_pallas_rho
    ok = use_pallas_rho(cfg) and use_pallas_kpp(cfg)
    if flag == "1":
        return ok or bool(
            os.environ.get("ROMS_TPU_PALLAS_KPP_INTERPRET"))
    return ok
