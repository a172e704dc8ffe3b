"""Large, McWilliams & Doney (1994) K-profile parameterization.

Re-implements ROMS/Nonlinear/lmd_vmix.F (interior Ri mixing + internal
wave + double diffusion hooks), lmd_skpp.F (surface boundary layer with
bulk-Richardson depth search, Monin-Obukhov similarity, cubic shape
functions, nonlocal transport) and lmd_swfrac.F (Paulson & Simpson 1977
two-band solar absorption).

The reference's downward IF-scan for the boundary-layer depth becomes a
vectorized first-crossing reduction along k; everything else is
whole-array arithmetic batched over the horizontal plane.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants
from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import fastmath
from ..ops import stencil as st
from ..ops.tridiag import tridiag_solve

# mod_scalars.F:1635-1712
LMD_RI0 = 0.7
LMD_BVFCON = -2.0e-5
LMD_NU0C = 0.01
LMD_NU0M = 10.0e-4
LMD_NU0S = 10.0e-4
LMD_CV = 1.25
LMD_RIC = 0.3
LMD_AM = 1.257
LMD_AS = -28.86
LMD_BETAT = -0.2
LMD_CEKMAN = 0.7
LMD_CMONOB = 1.0
LMD_CM = 8.36
LMD_CS = 98.96
LMD_EPSILON = 0.1
LMD_ZETAM = -0.2
LMD_ZETAS = -1.0
LMD_CSTAR = 10.0

# Jerlov water types (mod_scalars.F:1585-1595)
_MU1 = jnp.array([0.35, 0.6, 1.0, 1.5, 1.4, 0.42, 0.37, 0.33, 0.00468592])
_MU2 = jnp.array([23.0, 20.0, 17.0, 14.0, 7.9, 5.13, 3.54, 2.34, 1.51])
_R1 = jnp.array([0.58, 0.62, 0.67, 0.77, 0.78, 0.57, 0.57, 0.57, 0.55])

_EPS = 1.0e-10
_SMALL = 1.0e-20

# double-diffusion constants (mod_scalars.F lmd_* defaults)
LMD_RRHO0 = 1.9
LMD_NUF = 0.001
LMD_FDD = 0.7
LMD_NU = 1.5e-6
LMD_TDD1 = 0.909
LMD_TDD2 = 4.6
LMD_TDD3 = 0.54
LMD_SDD1 = 0.15
LMD_SDD2 = 1.85
LMD_SDD3 = 0.85


def swdk_frac(depth, jwtype: int = 1):
    """Fraction of shortwave remaining at positive depth below surface
    (lmd_swfrac.F, Zscale=-1)."""
    i = jwtype - 1
    return (_R1[i] * jnp.exp(-depth / _MU1[i])
            + (1.0 - _R1[i]) * jnp.exp(-depth / _MU2[i]))


def spline_ddz(rhs, Hz):
    """Conservative parabolic-spline vertical derivative at interior
    interfaces 1..N-1 (shared sweep of gls_corstep.F:278-310 /
    lmd_skpp.F RI_SPLINES):

        Hz[k] x[k-1] + 2(Hz[k]+Hz[k+1]) x[k] + Hz[k+1] x[k+1] = rhs[k]

    rhs: (N-1, ...).  Returns x with natural (zero) end extension folded
    into the first/last rows (dU(0)=dU(N)=0 in the reference).
    """
    lo = Hz[1:-1]
    dg = 2.0 * (Hz[:-1] + Hz[1:])
    up = Hz[1:-1]
    z = jnp.zeros_like(lo[:1])
    return tridiag_solve(jnp.concatenate([z, lo], axis=0), dg,
                         jnp.concatenate([up, z], axis=0), rhs)


def _alpha_beta(cfg: ModelConfig, t):
    """Surface thermal expansion / saline contraction (rho_eos.F:455-470,
    770-780).  Linear EOS: |Tcoef|, |Scoef|.  JM95: -(1/den) d(den1)/dT."""
    if cfg.eos.linear:
        alpha = jnp.full_like(t[0][-1], abs(cfg.eos.Tcoef))
        beta = jnp.full_like(t[0][-1], abs(cfg.eos.Scoef))
        return alpha, beta
    from .rho_eos import rho_eos_jm95
    Ts = t[0][-1]
    Ss = t[1][-1] if cfg.NT > 1 else jnp.zeros_like(Ts)

    def den_surf(T, S):
        tt = jnp.stack([T[None], S[None]])
        return rho_eos_jm95(cfg, tt, jnp.zeros_like(T)[None])[0] + 1000.0

    den = den_surf(Ts, Ss)
    _, dT = jax.jvp(lambda T: den_surf(T, Ss), (Ts,), (jnp.ones_like(Ts),))
    _, dS = jax.jvp(lambda S: den_surf(Ts, S), (Ss,), (jnp.ones_like(Ss),))
    return -dT / den, dS / den


def _wscale(Ustar, zetahat, vonKar):
    """Turbulent velocity scales wm/ws from similarity (lmd_skpp.F)."""
    from ..ops.fastmath import cbrt_pos, pow14
    Ustar3 = Ustar ** 3
    zetapar = zetahat / (Ustar3 + _SMALL)
    wm_stab = vonKar * Ustar / (1.0 + 5.0 * zetapar)
    wm_uns = jnp.where(
        zetapar > LMD_ZETAM,
        vonKar * Ustar * pow14(jnp.maximum(1.0 - 16.0 * zetapar,
                                           0.0)),
        vonKar * cbrt_pos(jnp.maximum(
            LMD_AM * Ustar3 - LMD_CM * zetahat, 0.0)))
    ws_uns = jnp.where(
        zetapar > LMD_ZETAS,
        vonKar * Ustar * jnp.sqrt(jnp.maximum(1.0 - 16.0 * zetapar, 0.0)),
        vonKar * cbrt_pos(jnp.maximum(
            LMD_AS * Ustar3 - LMD_CS * zetahat, 0.0)))
    stable = zetahat >= 0.0
    wm = jnp.where(stable, wm_stab, wm_uns)
    ws = jnp.where(stable, wm_stab, ws_uns)
    return wm, ws


def lmd_vmix_interior(cfg: ModelConfig, u, v, bvf, Hz):
    """Interior mixing: shear instability + internal waves + convective
    adjustment (lmd_vmix.F:99-380 + lmd_finish).  Returns (Akv, Akt)
    at interfaces (N+1, ...)."""
    du_c = (u[1:] - u[:-1]) + (st.ip1(u)[1:] - st.ip1(u)[:-1])
    dv_c = (v[1:] - v[:-1]) + (st.jp1(v)[1:] - st.jp1(v)[:-1])
    dU = spline_ddz(3.0 * du_c, Hz)
    dV = spline_ddz(3.0 * dv_c, Hz)
    shear2 = dU * dU + dV * dV
    bvf_i = bvf[1:-1]
    Rig = bvf_i / (shear2 + _EPS)

    # shear instability (LMD_RIMIX + RI_SPLINES smoothing factor)
    cff = jnp.minimum(1.0, jnp.maximum(0.0, Rig) / LMD_RI0)
    nu_sx = (1.0 - cff * cff) ** 3
    sh = bvf_i / (Rig + _EPS)
    nu_sx = nu_sx * sh * sh / (sh * sh + 16.0e-10)

    # internal-wave background scaled by stratification
    cffN = 1.0 / jnp.sqrt(jnp.maximum(bvf_i, 1.0e-7))
    Akv_i = 1.0e-6 * cffN + LMD_NU0M * nu_sx
    Akt_i = 1.0e-7 * cffN + LMD_NU0S * nu_sx

    # convective adjustment (lmd_finish, LMD_CONVEC)
    cffc = jnp.maximum(bvf_i, LMD_BVFCON)
    cffc = jnp.minimum(1.0, (LMD_BVFCON - cffc) / LMD_BVFCON)
    nu_sxc = (1.0 - cffc * cffc) ** 3
    Akv_i = Akv_i + LMD_NU0C * nu_sxc
    Akt_i = Akt_i + LMD_NU0C * nu_sxc

    zk = jnp.full_like(Akv_i[:1], cfg.mixing.akv_bak)
    zt = jnp.full_like(Akt_i[:1], cfg.mixing.akt_bak[0])
    Akv = jnp.concatenate([zk, Akv_i, zk], axis=0)
    Akt1 = jnp.concatenate([zt, Akt_i, zt], axis=0)
    Akt = jnp.stack([Akt1] * cfg.NAT)
    return Akv, Akt


def lmd_ddmix(cfg: ModelConfig, t, alfaobeta, Akt):
    """Double-diffusive interior mixing (LMD_DDMIX,
    lmd_vmix.F:363-429): salt-fingering and diffusive-convection
    diffusivity increments added to temperature and salinity Akt.

    alfaobeta: alpha/beta ratio at interior W interfaces (N-1, Mj, Li)
    — from rho_eos.eos_alpha_beta(all_levels=True) averaged or
    evaluated at interfaces.
    """
    T, S = t[0], t[1]
    dT = T[1:] - T[:-1]
    dS_raw = S[1:] - S[:-1]
    sgn = jnp.where(dS_raw >= 0.0, 1.0, -1.0)      # SIGN(1,0)=+1
    dS = sgn * jnp.maximum(jnp.abs(dS_raw), 1.0e-14)
    Rrho = alfaobeta * dT / dS

    # salt fingering: Rrho in (1, Rrho0], dS > 0 (:380-393)
    finger = (Rrho > 1.0) & (dS > 0.0)
    Rf = jnp.minimum(Rrho, LMD_RRHO0)
    nu1 = 1.0 - ((Rf - 1.0) / (LMD_RRHO0 - 1.0)) ** 2
    nu_dds_f = LMD_NUF * nu1 * nu1 * nu1
    nu_ddt_f = LMD_FDD * nu_dds_f

    # diffusive convection: 0 < Rrho < 1, dS < 0 (Marmorino &
    # Caldwell 1976; :397-415).  Clamp the unselected branch so
    # 1/Rrho stays finite under AD.
    convec = (Rrho > 0.0) & (Rrho < 1.0) & (dS < 0.0)
    Rc = jnp.where(convec, Rrho, 0.7)
    nu_ddt_c = LMD_NU * LMD_TDD1 * jnp.exp(
        LMD_TDD2 * jnp.exp(-LMD_TDD3 * ((1.0 / Rc) - 1.0)))
    nu_dds_c = jnp.where(Rc < 0.5, nu_ddt_c * LMD_SDD1 * Rc,
                         nu_ddt_c * (LMD_SDD2 * Rc - LMD_SDD3))

    nu_ddt = jnp.where(finger, nu_ddt_f,
                       jnp.where(convec, nu_ddt_c, 0.0))
    nu_dds = jnp.where(finger, nu_dds_f,
                       jnp.where(convec, nu_dds_c, 0.0))
    z = jnp.zeros_like(nu_ddt[:1])
    Akt = Akt.at[0].add(jnp.concatenate([z, nu_ddt, z], axis=0))
    if cfg.NAT > 1:
        Akt = Akt.at[1].add(jnp.concatenate([z, nu_dds, z], axis=0))
    return Akt


def lmd_skpp(cfg: ModelConfig, grid: Grid, t, u, v, pden, bvf, Hz,
             z_r, z_w, forcing, Akv, Akt, jwtype=None):
    """Surface boundary layer (lmd_skpp.F).

    Returns (Akv, Akt, ghats, hsbl); ghats (NAT, N+1, ...) is the
    nonlocal transport term consumed by pre_step3d (LMD_NONLOCAL:
    vertical flux -= dt*Akt*ghats).
    """
    if jwtype is None:
        jwtype = cfg.mixing.jwtype
    g = constants.g
    vonKar = constants.vonKar
    N = cfg.N
    NAT = cfg.NAT
    gorho0 = g / cfg.rho0
    Vtc = LMD_CV * jnp.sqrt(-LMD_BETAT) / \
        (jnp.sqrt(LMD_CS * LMD_EPSILON) * LMD_RIC * vonKar ** 2)
    lmd_Cg = LMD_CSTAR * vonKar * \
        (LMD_CS * vonKar * LMD_EPSILON) ** (1.0 / 3.0)

    sustr, svstr = forcing.sustr, forcing.svstr
    stflx, srflx = forcing.stflx, forcing.srflx
    taux_r = 0.5 * (sustr + st.ip1(sustr))
    tauy_r = 0.5 * (svstr + st.jp1(svstr))
    Ustar = fastmath.pow14(taux_r ** 2 + tauy_r ** 2)

    alpha, beta = _alpha_beta(cfg, t)
    if cfg.NT > 1:
        Bo = g * (alpha * (stflx[0] - srflx) - beta * stflx[1])
    else:
        Bo = g * alpha * (stflx[0] - srflx)
    Bosol = g * alpha * srflx

    # surface buoyancy flux absorbed above each interface (N+1 levels)
    depth_w = z_w[-1][None] - z_w                     # (N+1,...)
    swdk_w = swdk_frac(depth_w, jwtype)
    Bflux = Bo[None] + Bosol[None] * (1.0 - swdk_w)

    # ---- spline derivatives of pden, u, v at interfaces -----------------
    dR_i = spline_ddz(6.0 * (pden[1:] - pden[:-1]), Hz)
    dU_i = spline_ddz(3.0 * ((u[1:] - u[:-1])
                             + (st.ip1(u)[1:] - st.ip1(u)[:-1])), Hz)
    dV_i = spline_ddz(3.0 * ((v[1:] - v[:-1])
                             + (st.jp1(v)[1:] - st.jp1(v)[:-1])), Hz)
    zz = jnp.zeros_like(dR_i[:1])
    dR = jnp.concatenate([zz, dR_i, zz], axis=0)      # (N+1,...)
    dU = jnp.concatenate([zz, dU_i, zz], axis=0)
    dV = jnp.concatenate([zz, dV_i, zz], axis=0)

    c3, c6 = 1.0 / 3.0, 1.0 / 6.0
    u_r = 0.5 * (u + st.ip1(u))
    v_r = 0.5 * (v + st.jp1(v))
    Rref = pden[-1] + Hz[-1] * (c3 * dR[-1] + c6 * dR[-2])
    Uref = u_r[-1] + Hz[-1] * (c3 * dU[-1] + c6 * dU[-2])
    Vref = v_r[-1] + Hz[-1] * (c3 * dV[-1] + c6 * dV[-2])

    # ---- bulk Richardson number at interfaces k-1, scanned layer k ------
    # depth(k) = z_w[N]-z_w[k-1]; FC at interfaces 0..N-1, FC[N]=0.
    depth_k = z_w[-1][None] - z_w[:-1]                # (N,...) interfaces 0..N-1
    Bf_k = Bflux[:-1]                                 # at interface k-1
    sl0 = LMD_EPSILON * (z_w[-1] - z_w[0] * 0.0)      # placeholder
    sl_dpth0 = LMD_EPSILON * depth_k                  # epsilon*depth proxy
    # reference: sl_dpth = epsilon*(z_w[N]-hsbl_prev); using epsilon*depth
    # of the interface (equivalent limiter MIN(sl,depth) at first pass)
    sigma = jnp.where(Bf_k < 0.0,
                      jnp.minimum(sl_dpth0, depth_k), depth_k)
    wm_k, ws_k = _wscale(Ustar[None], vonKar * sigma * Bf_k, vonKar)

    Rk = pden - Hz * (c3 * dR[:-1] + c6 * dR[1:])
    Uk = u_r - Hz * (c3 * dU[:-1] + c6 * dU[1:])
    Vk = v_r - Hz * (c3 * dV[:-1] + c6 * dV[1:])
    Ritop = -gorho0 * (Rref[None] - Rk) * depth_k
    Ribot = (Uref[None] - Uk) ** 2 + (Vref[None] - Vk) ** 2 + \
        Vtc * depth_k * ws_k * jnp.sqrt(jnp.abs(bvf[:-1]))
    FC = Ritop / (Ribot + _EPS)                       # interfaces 0..N-1
    FCfull = jnp.concatenate([FC, jnp.zeros_like(FC[:1])], axis=0)

    # first crossing scanning downward: largest k in [2..N] with
    # FC[k]<Ric<=FC[k-1]; default ksbl=1, hsbl=z_w[1].
    karr = jnp.arange(1, N + 1)[:, None, None]        # k=1..N
    cond = (FCfull[1:] < LMD_RIC) & (FCfull[:-1] >= LMD_RIC) & (karr >= 2)
    kcross = jnp.max(jnp.where(cond, karr, 0), axis=0)   # 0 if none
    found = kcross >= 2
    ks = jnp.maximum(kcross, 1)

    def gather_k(f, idx):
        return jnp.take_along_axis(f, idx[None], axis=0)[0]

    FCk = gather_k(FCfull, ks)
    FCkm1 = gather_k(FCfull, ks - 1)
    zwk = gather_k(z_w, ks)
    zwkm1 = gather_k(z_w, ks - 1)
    hsbl_x = ((FCkm1 - LMD_RIC) * zwk + (LMD_RIC - FCk) * zwkm1) / \
        (FCkm1 - FCk + _SMALL)
    hsbl = jnp.where(found, hsbl_x, z_w[1])

    # ---- Ekman / Monin-Obukhov caps under stable forcing ----------------
    swdk_bl = swdk_frac(z_w[-1] - hsbl, jwtype)
    Bfsfc = Bo + Bosol * (1.0 - swdk_bl)
    hekman = LMD_CEKMAN * Ustar / jnp.maximum(jnp.abs(grid.f), _EPS)
    hmonob = LMD_CMONOB * Ustar ** 3 / \
        jnp.maximum(vonKar * Bfsfc, _EPS)
    cap = z_w[-1] - jnp.minimum(jnp.minimum(hekman, hmonob),
                                z_w[-1] - hsbl)
    hsbl = jnp.where((Ustar > 0.0) & (Bfsfc > 0.0), cap, hsbl)
    hsbl = jnp.clip(hsbl, z_w[0], z_w[-1])

    # ksbl: number of interfaces z_w[0..N-1] strictly below hsbl
    ksbl = jnp.maximum(
        jnp.sum((z_w[:-1] < hsbl[None]).astype(jnp.int32), axis=0), 1)

    # ---- boundary-layer thickness scales and matching -------------------
    swdk_bl = swdk_frac(z_w[-1] - hsbl, jwtype)
    Bfsfc = Bo + Bosol * (1.0 - swdk_bl)
    zbl = z_w[-1] - hsbl
    sl_dpth = LMD_EPSILON * zbl
    sig_bl = jnp.where(Bfsfc > 0.0, zbl, LMD_EPSILON * zbl)
    wm_bl, ws_bl = _wscale(Ustar, vonKar * sig_bl * Bfsfc, vonKar)
    f1 = 5.0 * jnp.maximum(0.0, Bfsfc) * vonKar / (Ustar ** 4 + _EPS)

    zw_ks = gather_k(z_w, ksbl)
    zw_ksm1 = gather_k(z_w, ksbl - 1)
    cffk = 1.0 / (zw_ks - zw_ksm1)
    cff_dn = cffk * (hsbl - zw_ksm1)
    cff_up = cffk * (zw_ks - hsbl)

    def match(K):
        K_bl = cff_dn * gather_k(K, ksbl) + cff_up * gather_k(K, ksbl - 1)
        dK_bl = cffk * (gather_k(K, ksbl) - gather_k(K, ksbl - 1))
        return K_bl, dK_bl

    Kv_bl, dKv_bl = match(Akv)
    G1 = {}
    dG1 = {}
    Kv1 = Kv_bl / (zbl * wm_bl + _EPS)
    dKv1 = jnp.minimum(0.0, -dKv_bl / (wm_bl + _EPS) - Kv_bl * f1)
    Kt_bls = [match(Akt[it]) for it in range(NAT)]
    Kt1 = [Kt_bls[it][0] / (zbl * ws_bl + _EPS) for it in range(NAT)]
    dKt1 = [jnp.minimum(0.0, -Kt_bls[it][1] / (ws_bl + _EPS)
                        - Kt_bls[it][0] * f1) for it in range(NAT)]

    # ---- interior overwrite with shape-function profile -----------------
    # at interfaces k=1..N-1 with k > ksbl
    kif = jnp.arange(1, N)[:, None, None]
    inside = kif > ksbl[None]
    depth_i = z_w[-1][None] - z_w[1:-1]
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
    Akv_new = Akv.at[1:-1].set(jnp.where(inside, Akv_bl, Akv[1:-1]))

    Akt_new = []
    for it in range(NAT):
        Gt = a1 + a2 * Kt1[it][None] + a3 * dKt1[it][None]
        Akt_bl = depth_i * ws_i * (1.0 + sig * Gt)
        Akt_new.append(Akt[it].at[1:-1].set(
            jnp.where(inside, Akt_bl, Akt[it][1:-1])))
    Akt_new = jnp.stack(Akt_new)

    # ---- nonlocal transport (LMD_NONLOCAL) ------------------------------
    # ghats = Cg * (surface flux) / (zbl*ws) under unstable forcing, only
    # inside the boundary layer (lmd_skpp.F ghats section).
    unstable = (Bflux[1:-1] < 0.0)
    cff_nl = lmd_Cg / (zbl[None] * ws_i + _EPS)
    ghat_T = jnp.where(inside & unstable,
                       -cff_nl * (stflx[0][None] - srflx[None]
                                  + srflx[None] * (1.0 - swdk_w[1:-1])),
                       0.0)
    pads = jnp.zeros_like(ghat_T[:1])
    ghat_T = jnp.concatenate([pads, ghat_T, pads], axis=0)
    if NAT > 1:
        ghat_S = jnp.where(inside & unstable,
                           cff_nl * stflx[1][None], 0.0)
        ghat_S = jnp.concatenate([pads, ghat_S, pads], axis=0)
        ghats = jnp.stack([ghat_T, ghat_S])
    else:
        ghats = ghat_T[None]

    return Akv_new, Akt_new, ghats, hsbl



def lmd_bkpp(cfg: ModelConfig, grid: Grid, t, u, v, pden, bvf, Hz,
             z_r, z_w, forcing, bustr, bvstr, Akv, Akt, ksbl_guard=None,
             jwtype=None):
    """Bottom boundary layer KPP (lmd_bkpp.F) — the mirror of lmd_skpp
    with depth measured up from the bottom and the bottom-stress
    friction velocity.  Inside the surface boundary layer the bottom
    profile only RAISES the coefficients (MAX), else it replaces them
    (lmd_bkpp.F:536-552).
    """
    if jwtype is None:
        jwtype = cfg.mixing.jwtype
    g = constants.g
    vonKar = constants.vonKar
    N = cfg.N
    NAT = cfg.NAT
    gorho0 = g / cfg.rho0
    Vtc = LMD_CV * jnp.sqrt(-LMD_BETAT) / \
        (jnp.sqrt(LMD_CS * LMD_EPSILON) * LMD_RIC * vonKar ** 2)

    taux_r = 0.5 * (bustr + st.ip1(bustr))
    tauy_r = 0.5 * (bvstr + st.jp1(bvstr))
    Ustar = fastmath.pow14(taux_r ** 2 + tauy_r ** 2)

    alpha, beta = _alpha_beta(cfg, t)
    btflx = forcing.btflx
    if cfg.NT > 1:
        Bo = g * (alpha * btflx[0] - beta * btflx[1])
    else:
        Bo = g * alpha * btflx[0]
    Bosol = g * alpha * forcing.srflx
    depth_sfc = z_w[-1][None] - z_w
    Bflux = Bo[None] + Bosol[None] * (1.0 - swdk_frac(depth_sfc, jwtype))

    dR_i = spline_ddz(6.0 * (pden[1:] - pden[:-1]), Hz)
    dU_i = spline_ddz(3.0 * ((u[1:] - u[:-1])
                             + (st.ip1(u)[1:] - st.ip1(u)[:-1])), Hz)
    dV_i = spline_ddz(3.0 * ((v[1:] - v[:-1])
                             + (st.jp1(v)[1:] - st.jp1(v)[:-1])), Hz)
    zz = jnp.zeros_like(dR_i[:1])
    dR = jnp.concatenate([zz, dR_i, zz], axis=0)
    dU = jnp.concatenate([zz, dU_i, zz], axis=0)
    dV = jnp.concatenate([zz, dV_i, zz], axis=0)

    c3, c6 = 1.0 / 3.0, 1.0 / 6.0
    u_r = 0.5 * (u + st.ip1(u))
    v_r = 0.5 * (v + st.jp1(v))
    # bottom reference values (lmd_bkpp.F:268-276)
    Rref = pden[0] - Hz[0] * (c3 * dR[0] + c6 * dR[1])
    Uref = u_r[0] - Hz[0] * (c3 * dU[0] + c6 * dU[1])
    Vref = v_r[0] - Hz[0] * (c3 * dV[0] + c6 * dV[1])

    # bulk Richardson at interfaces k=1..N; depth up from the bottom
    depth_k = z_w[1:] - z_w[:1]                       # (N,...)
    Bf_k = Bflux[1:]
    sigma = jnp.where(Bf_k < 0.0,
                      jnp.minimum(LMD_EPSILON * depth_k, depth_k),
                      depth_k)
    wm_k, ws_k = _wscale(Ustar[None], vonKar * sigma * Bf_k, vonKar)
    Rk = pden + Hz * (c3 * dR[1:] + c6 * dR[:-1])
    Uk = u_r + Hz * (c3 * dU[1:] + c6 * dU[:-1])
    Vk = v_r + Hz * (c3 * dV[1:] + c6 * dV[:-1])
    Ritop = -gorho0 * (Rk - Rref[None]) * depth_k
    Ribot = (Uk - Uref[None]) ** 2 + (Vk - Vref[None]) ** 2 + \
        Vtc * depth_k * ws_k * jnp.sqrt(jnp.abs(bvf[1:]))
    FC = Ritop / (Ribot + _EPS)                       # interfaces 1..N
    FCfull = jnp.concatenate([jnp.zeros_like(FC[:1]), FC], axis=0)

    # first upward crossing: smallest k with FC[k-1]<Ric<=FC[k]
    karr = jnp.arange(1, N + 1)[:, None, None]
    cond = (FCfull[:-1] < LMD_RIC) & (FCfull[1:] >= LMD_RIC)
    big = N + 1
    kcross = jnp.min(jnp.where(cond, karr, big), axis=0)
    found = kcross <= N
    kb = jnp.minimum(kcross, N)

    def gather_k(f, idx):
        return jnp.take_along_axis(f, idx[None], axis=0)[0]

    FCk = gather_k(FCfull, kb)
    FCkm1 = gather_k(FCfull, kb - 1)
    zwk = gather_k(z_w, kb)
    zwkm1 = gather_k(z_w, kb - 1)
    hbbl_x = ((LMD_RIC - FCkm1) * zwk + (FCk - LMD_RIC) * zwkm1) / \
        (FCk - FCkm1 + _SMALL)
    hbbl = jnp.where(found, hbbl_x, z_w[-1])

    # Ekman cap from the bottom (lmd_bkpp.F:365-371)
    hekman = LMD_CEKMAN * Ustar / jnp.maximum(jnp.abs(grid.f), _EPS) \
        - grid.h
    hbbl = jnp.minimum(hbbl, hekman)
    hbbl = jnp.clip(hbbl, z_w[0], z_w[-1])

    kbbl = jnp.maximum(
        N - jnp.sum((z_w[1:] > hbbl[None]).astype(jnp.int32), axis=0)
        + 1, 1)
    kbbl = jnp.minimum(kbbl, N)

    zbl = hbbl - z_w[0]
    bl_dpth = LMD_EPSILON * zbl
    swdk_bl = swdk_frac(z_w[-1] - hbbl, jwtype)
    Bfbot = Bo + Bosol * (1.0 - swdk_bl)
    sig_bl = jnp.where(Bfbot > 0.0, zbl, LMD_EPSILON * zbl)
    wm_bl, ws_bl = _wscale(Ustar, vonKar * sig_bl * Bfbot, vonKar)
    f1 = 5.0 * jnp.maximum(0.0, Bfbot) * vonKar / (Ustar ** 4 + _EPS)

    zw_kb = gather_k(z_w, kbbl)
    zw_kbm1 = gather_k(z_w, kbbl - 1)
    cffk = 1.0 / (zw_kb - zw_kbm1)
    cff_dn = cffk * (hbbl - zw_kbm1)
    cff_up = cffk * (zw_kb - hbbl)

    def match(K, w):
        K_bl = cff_dn * gather_k(K, kbbl) + cff_up * gather_k(K, kbbl - 1)
        dK_bl = -cffk * (gather_k(K, kbbl) - gather_k(K, kbbl - 1))
        G1 = K_bl / (zbl * w + _EPS)
        dG1 = jnp.minimum(0.0, K_bl * f1 - dK_bl / (w + _EPS))
        return G1, dG1

    Gm1, dGm1 = match(Akv, wm_bl)
    Gt1s = [match(Akt[it], ws_bl) for it in range(NAT)]

    kif = jnp.arange(1, N)[:, None, None]
    inside = z_w[1:-1] < hbbl[None]
    depth_i = z_w[1:-1] - z_w[:1]
    Bf_i = Bflux[1:-1]
    sigma_i = jnp.where(Bf_i < 0.0,
                        jnp.minimum(bl_dpth[None], depth_i), depth_i)
    wm_i, ws_i = _wscale(Ustar[None], vonKar * sigma_i * Bf_i, vonKar)
    sig = depth_i / (zbl[None] + _EPS)
    a1 = sig - 2.0
    a2 = 3.0 - 2.0 * sig
    a3 = sig - 1.0
    Gm = a1 + a2 * Gm1[None] + a3 * dGm1[None]
    Akv_bl = depth_i * wm_i * (1.0 + sig * Gm)
    # inside the surface boundary layer only raise; else replace
    in_sbl = (ksbl_guard[None] < kif) if ksbl_guard is not None \
        else jnp.zeros_like(inside)
    newKv = jnp.where(in_sbl, jnp.maximum(Akv[1:-1], Akv_bl), Akv_bl)
    Akv_new = Akv.at[1:-1].set(jnp.where(inside, newKv, Akv[1:-1]))

    Akt_new = []
    for it in range(NAT):
        G1, dG1 = Gt1s[it]
        Gt = a1 + a2 * G1[None] + a3 * dG1[None]
        Akt_bl = depth_i * ws_i * (1.0 + sig * Gt)
        newKt = jnp.where(in_sbl, jnp.maximum(Akt[it][1:-1], Akt_bl),
                          Akt_bl)
        Akt_new.append(Akt[it].at[1:-1].set(
            jnp.where(inside, newKt, Akt[it][1:-1])))
    return Akv_new, jnp.stack(Akt_new), hbbl
