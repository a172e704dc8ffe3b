"""Generic length scale (GLS) turbulence closure (k-epsilon / k-omega /
k-kl / gen), Umlauf & Burchard (2003).

Re-implements ROMS/Nonlinear/gls_prestep.F and gls_corstep.F as
whole-array kernels: AB2 predictor advection of TKE/psi at w-interfaces,
corrector advection + shear/buoyancy production, implicit vertical
solves (batched tridiagonal along k), Galperin limiters, and the
Canuto-A / Kantha-Clayson stability functions that deliver Akv/Akt.

TKE and psi live at w-interfaces (N+1 levels); the prognostic cells are
the interior interfaces k=1..N-1 with Dirichlet surface/bottom values
from the stress balance (gls_corstep.F:655-700).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from .. import constants
from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st
from ..ops.tridiag import tridiag_solve
from . import boundary

# --- closure constants (mod_scalars.F:1769-1795, 1846-1859, 4728-4767) ---
_EPS = 1.0e-10

# Canuto-A (mod_scalars.F:1769-1778)
_CA = dict(Gh0=0.0329, Ghcri=0.03, L1=0.107, L2=0.0032, L3=0.0864,
           L4=0.12, L5=11.9, L6=0.4, L7=0.0, L8=0.48)
_GHMIN = -0.28
_GLS_E2 = 1.33

# Mellor-Yamada constants for Kantha-Clayson stability functions
_MY = dict(A1=0.92, A2=0.74, B1=16.6, B2=10.1, C1=0.08, C2=0.7, C3=0.2)


def _canuto_a_coeffs():
    L = _CA
    s0 = 1.5 * L["L1"] * L["L5"] ** 2
    s1 = (-L["L4"] * (L["L6"] + L["L7"])
          + 2.0 * L["L4"] * L["L5"] * (L["L1"] - L["L2"] / 3.0 - L["L3"])
          + 1.5 * L["L1"] * L["L5"] * L["L8"])
    s2 = -3.0 / 8.0 * L["L1"] * (L["L6"] ** 2 - L["L7"] ** 2)
    s4 = 2.0 * L["L5"]
    s5 = 2.0 * L["L4"]
    s6 = (2.0 / 3.0 * L["L5"] * (3.0 * L["L3"] ** 2 - L["L2"] ** 2)
          - 0.5 * L["L5"] * L["L1"] * (3.0 * L["L3"] - L["L2"])
          + 0.75 * L["L1"] * (L["L6"] - L["L7"]))
    b0 = 3.0 * L["L5"] ** 2
    b1 = L["L5"] * (7.0 * L["L4"] + 3.0 * L["L8"])
    b2 = (L["L5"] ** 2 * (3.0 * L["L3"] ** 2 - L["L2"] ** 2)
          - 0.75 * (L["L6"] ** 2 - L["L7"] ** 2))
    b3 = L["L4"] * (4.0 * L["L4"] + 3.0 * L["L8"])
    b5 = 0.25 * (L["L2"] ** 2 - 3.0 * L["L3"] ** 2) * \
        (L["L6"] ** 2 - L["L7"] ** 2)
    b4 = (L["L4"] * (L["L2"] * L["L6"] - 3.0 * L["L3"] * L["L7"]
                     - L["L5"] * (L["L2"] ** 2 - L["L3"] ** 2))
          + L["L5"] * L["L8"] * (3.0 * L["L3"] ** 2 - L["L2"] ** 2))
    return dict(s0=s0, s1=s1, s2=s2, s4=s4, s5=s5, s6=s6,
                b0=b0, b1=b1, b2=b2, b3=b3, b4=b4, b5=b5)


class MixState(NamedTuple):
    """Prognostic turbulence fields (mod_mixing.F:179-238)."""
    tke: jnp.ndarray        # (N+1, Mj, Li) at time n
    tke_prev: jnp.ndarray   # time n-1 (AB2 history)
    gls: jnp.ndarray
    gls_prev: jnp.ndarray
    Akv: jnp.ndarray        # (N+1, Mj, Li)
    Akt: jnp.ndarray        # (NAT, N+1, Mj, Li)
    Akk: jnp.ndarray        # diffusivity of tke
    Akp: jnp.ndarray        # diffusivity of gls
    Lscale: jnp.ndarray     # dissipative length scale


def initial_mix(cfg: ModelConfig) -> MixState:
    m = cfg.mixing
    dtype = jnp.dtype(cfg.dtype)
    shp = (cfg.N + 1,) + cfg.shape2d
    tke = jnp.full(shp, m.gls_kmin, dtype)
    gls = jnp.full(shp, m.gls_pmin, dtype)
    Akv = jnp.full(shp, m.akv_bak, dtype)
    Akt = jnp.stack([jnp.full(shp, ab, dtype) for ab in m.akt_bak])
    Akk = jnp.full(shp, m.akk_bak, dtype)
    Akp = jnp.full(shp, m.akp_bak, dtype)
    Lscale = jnp.full(shp, 1.0e-6, dtype)
    return MixState(tke=tke, tke_prev=tke, gls=gls, gls_prev=gls,
                    Akv=Akv, Akt=Akt, Akk=Akk, Akp=Akp, Lscale=Lscale)


def _bc_w(cfg, f):
    """tkebc gradient-at-edges + periodic (tkebc_im.F semantics for the
    closed/periodic family)."""
    return boundary.bc_rho(f, cfg.bc.tke)


def _hadv_interface(cfg, grid, q, Huon, Hvom, Gadv=-0.25, c4: bool = True):
    """Horizontal advective fluxes of an interface field at level k
    interfaces 1..N-1, flux velocity 0.5*(Huon[k]+Huon[k+1]).

    q: (N-1, Mj, Li) interface values (k=1..N-1); Huon: (N, Mj, Li).
    Default 3rd-order upstream-biased (gls_corstep.F '#else' branch).
    """
    XF = 0.5 * (Huon[:-1] + Huon[1:])     # (N-1,...) at u points
    EF = 0.5 * (Hvom[:-1] + Hvom[1:])
    dqx = (q - st.im1(q)) * grid.umask
    dqe = (q - st.jm1(q)) * grid.vmask
    curvx = st.ip1(dqx) - dqx
    curve = st.jp1(dqe) - dqe
    if cfg.bc.ew_periodic:
        curvx = st.periodic_x(curvx)
    else:
        curvx = st.zero_east(st.zero_west(curvx))
    if cfg.bc.ns_periodic:
        curve = st.periodic_y(curve)
    else:
        curve = st.zero_south(st.zero_north(curve))
    upx = jnp.where(XF > 0.0, st.im1(curvx), curvx)
    upe = jnp.where(EF > 0.0, st.jm1(curve), curve)
    FX = XF * 0.5 * (q + st.im1(q) - Gadv * upx)
    FE = EF * 0.5 * (q + st.jm1(q) - Gadv * upe)
    return FX, FE


def gls_prestep(cfg: ModelConfig, grid: Grid, mix: MixState,
                Huon, Hvom, W, Hz, iic):
    """Predictor for tke/gls (gls_prestep.F).

    Returns (tke_half, gls_half, tke_seed, gls_seed) where the half
    fields are interface values at n+1/2 (full N+1 levels; boundary
    levels copied from time n) and the seeds are Hz_w * q(n) for the
    corrector's implicit solve.
    """
    dt = cfg.dt
    pmn = grid.pm * grid.pn
    N = cfg.N
    Gamma = 1.0 / 6.0
    cff1 = jnp.where(iic == 0, 1.0, 0.5 + Gamma)
    cff2 = jnp.where(iic == 0, 0.0, 0.5 - Gamma)
    cff3 = jnp.where(iic == 0, 0.5 * dt, (1.0 - Gamma) * dt)

    Hz_w = 0.5 * (Hz[:-1] + Hz[1:])       # (N-1,...) at interfaces 1..N-1
    q_int = mix.tke[1:-1]
    p_int = mix.gls[1:-1]
    q_old = mix.tke_prev[1:-1]
    p_old = mix.gls_prev[1:-1]

    FXq, FEq = _hadv_interface(cfg, grid, q_int, Huon, Hvom)
    FXp, FEp = _hadv_interface(cfg, grid, p_int, Huon, Hvom)
    XF = 0.5 * (Huon[:-1] + Huon[1:])
    EF = 0.5 * (Hvom[:-1] + Hvom[1:])

    cff4 = cff3 * pmn
    Hz_half = Hz_w - cff4 * (st.dx_p(XF) + st.dy_p(EF))
    tke_h = Hz_w * (cff1 * q_int + cff2 * q_old) - \
        cff4 * (st.dx_p(FXq) + st.dy_p(FEq))
    gls_h = Hz_w * (cff1 * p_int + cff2 * p_old) - \
        cff4 * (st.dx_p(FXp) + st.dy_p(FEp))

    # vertical advection at cell centers k=1..N (C4-ish, gls_prestep
    # '#else' branch), flux velocity 0.5*(W[k]+W[k-1]) at rho levels.
    Wc = 0.5 * (W[:-1] + W[1:])           # (N,...) at rho levels
    q = mix.tke
    p = mix.gls
    c71, c112 = 7.0 / 12.0, 1.0 / 12.0

    def vflux(qq):
        Fi = Wc[1:-1] * (c71 * (qq[1:-2] + qq[2:-1])
                         - c112 * (qq[:-3] + qq[3:]))   # levels 2..N-1
        F1 = Wc[0] * (qq[0] / 3.0 + 5.0 / 6.0 * qq[1] - qq[2] / 6.0)
        Fn = Wc[-1] * (qq[N] / 3.0 + 5.0 / 6.0 * qq[N - 1]
                       - qq[N - 2] / 6.0)
        return jnp.concatenate([F1[None], Fi, Fn[None]], axis=0)  # (N,...)

    FCq = vflux(q)
    FCp = vflux(p)
    Hz_half = Hz_half - cff4 * (Wc[1:] - Wc[:-1])
    oHz_half = 1.0 / Hz_half
    tke_h = oHz_half * (tke_h - cff4 * (FCq[1:] - FCq[:-1]))
    gls_h = oHz_half * (gls_h - cff4 * (FCp[1:] - FCp[:-1]))

    tke_half = jnp.concatenate([q[:1], tke_h, q[-1:]], axis=0)
    gls_half = jnp.concatenate([p[:1], gls_h, p[-1:]], axis=0)
    tke_half = _bc_w(cfg, tke_half)
    gls_half = _bc_w(cfg, gls_half)

    tke_seed = Hz_w * q_int
    gls_seed = Hz_w * p_int
    return tke_half, gls_half, tke_seed, gls_seed


def shear2_spline(u, v, Hz):
    """Parabolic-spline (du/dz)^2+(dv/dz)^2 at interior interfaces
    (RI_SPLINES path, gls_corstep.F:278-310 / my25_corstep.F)."""
    du_c = (u[1:] - u[:-1]) + (st.ip1(u)[1:] - st.ip1(u)[:-1])
    dv_c = (v[1:] - v[:-1]) + (st.jp1(v)[1:] - st.jp1(v)[:-1])
    lo = Hz[1:-1]
    dg = 2.0 * Hz[1:] + 2.0 * Hz[:-1]
    up = Hz[1:-1]
    zpad = jnp.zeros_like(lo[:1])
    dU = tridiag_solve(jnp.concatenate([zpad, lo], axis=0), dg,
                       jnp.concatenate([up, zpad], axis=0), 3.0 * du_c)
    dV = tridiag_solve(jnp.concatenate([zpad, lo], axis=0), dg,
                       jnp.concatenate([up, zpad], axis=0), 3.0 * dv_c)
    return dU * dU + dV * dV


def n2s2_horavg(cfg, f):
    """Horizontal smoothing of N2/S2 (N2S2_HORAVG branch)."""
    fp = 0.25 * (f + st.ip1(f) + st.jp1(f) + st.ip1(st.jp1(f)))
    if cfg.bc.ew_periodic:
        fp = st.periodic_x(fp)
    if cfg.bc.ns_periodic:
        fp = st.periodic_y(fp)
    return 0.25 * (fp + st.im1(fp) + st.jm1(fp) + st.im1jm1(fp))


def corstep_advect(cfg, grid, tke_half, gls_half, tke_seed, gls_seed,
                   Huon, Hvom, W):
    """Corrector advection of the half-step interface fields shared by
    gls_corstep and my25_corstep: horizontal 3rd-order upstream + C4-ish
    vertical of Hz-weighted tke/psi.  Returns (tke_n, gls_n) >= 0."""
    dt = cfg.dt
    N = cfg.N
    pmn = grid.pm * grid.pn
    FXq, FEq = _hadv_interface(cfg, grid, tke_half[1:-1], Huon, Hvom)
    FXp, FEp = _hadv_interface(cfg, grid, gls_half[1:-1], Huon, Hvom)
    cffd = dt * pmn
    tke_n = tke_seed - cffd * (st.dx_p(FXq) + st.dy_p(FEq))
    gls_n_ = gls_seed - cffd * (st.dx_p(FXp) + st.dy_p(FEp))

    Wc = 0.5 * (W[:-1] + W[1:])
    c71, c112 = 7.0 / 12.0, 1.0 / 12.0

    def vflux(qq):
        Fi = Wc[1:-1] * (c71 * (qq[1:-2] + qq[2:-1])
                         - c112 * (qq[:-3] + qq[3:]))
        F1 = Wc[0] * (qq[0] / 3.0 + 5.0 / 6.0 * qq[1] - qq[2] / 6.0)
        Fn = Wc[-1] * (qq[N] / 3.0 + 5.0 / 6.0 * qq[N - 1]
                       - qq[N - 2] / 6.0)
        return jnp.concatenate([F1[None], Fi, Fn[None]], axis=0)

    FCq = vflux(tke_half)
    FCp = vflux(gls_half)
    tke_n = jnp.maximum(tke_n - cffd * (FCq[1:] - FCq[:-1]), 0.0)
    gls_n_ = jnp.maximum(gls_n_ - cffd * (FCp[1:] - FCp[:-1]), 0.0)
    return tke_n, gls_n_


def gls_corstep(cfg: ModelConfig, grid: Grid, mix: MixState,
                tke_half, gls_half, tke_seed, gls_seed,
                u, v, Hz, z_r, z_w, Huon, Hvom, W, bvf,
                sustr, svstr, bustr, bvstr) -> MixState:
    """Corrector + implicit solve + stability functions (gls_corstep.F)."""
    m = cfg.mixing
    dt = cfg.dt
    g = constants.g
    vonKar = constants.vonKar
    pmn = grid.pm * grid.pn
    N = cfg.N
    NAT = cfg.NAT
    p_, m_, n_ = m.gls_p, m.gls_m, m.gls_n
    cmu0 = m.gls_cmu0
    Kmin, Pmin = m.gls_kmin, m.gls_pmin
    Zos_min = max(getattr(m, "gls_Zos", 0.02), 0.0001)
    Zob_min = max(cfg.drag.Zob, 0.0001)
    L_sft = vonKar

    cmu_fac1 = cmu0 ** (-p_ / n_)
    cmu_fac2 = cmu0 ** (3.0 + p_ / n_)
    cmu_fac3 = 1.0 / cmu0 ** 2
    gls_fac4 = cmu0 ** p_
    gls_fac5 = 0.56 ** (0.5 * n_) * cmu0 ** p_
    gls_fac6 = 8.0 / cmu0 ** 6
    gls_exp1 = 1.0 / n_
    tke_exp1 = m_ / n_
    tke_exp2 = 0.5 + m_ / n_
    tke_exp4 = m_ + 0.5 * n_
    sqrt2 = math.sqrt(2.0)

    # ---- shear^2 at interior interfaces (RI_SPLINES path) --------------
    shear2 = shear2_spline(u, v, Hz)      # (N-1,...) interfaces 1..N-1
    buoy2 = bvf[1:-1]

    # ---- horizontal average of N2/S2 (N2S2_HORAVG) -----------------------
    shear2 = n2s2_horavg(cfg, shear2)
    buoy2_a = n2s2_horavg(cfg, buoy2)

    # ---- corrector advection of half-step fields -------------------------
    tke_n, gls_n_ = corstep_advect(cfg, grid, tke_half, gls_half,
                                   tke_seed, gls_seed, Huon, Hvom, W)

    # ---- production / dissipation sources (gls_corstep.F:596-654) -------
    tke0 = mix.tke[1:-1]
    gls0 = mix.gls[1:-1]
    Akv_i = mix.Akv[1:-1]
    Akt_i = mix.Akt[0][1:-1]
    akv_ex = Akv_i - m.akv_bak
    akt_ex = Akt_i - m.akt_bak[0]
    gls_c3 = jnp.where(buoy2_a > 0.0, m.gls_c3m, m.gls_c3p)
    Kprod = shear2 * akv_ex - buoy2_a * akt_ex
    Pprod = m.gls_c1 * shear2 * akv_ex - gls_c3 * buoy2_a * akt_ex
    neg_K = Kprod < 0.0
    neg_P = Pprod < 0.0
    Kprod = jnp.where(neg_K, Kprod + buoy2_a * akt_ex, Kprod)
    Pprod = jnp.where(neg_P, Pprod + gls_c3 * buoy2_a * akt_ex, Pprod)
    Hz_w = 0.5 * (Hz[:-1] + Hz[1:])
    tke0s = jnp.maximum(tke0, Kmin)
    tke_n = tke_n + dt * Hz_w * Kprod
    gls_n_ = gls_n_ + dt * Hz_w * Pprod * gls0 / tke0s

    # implicit dissipation + negative-production terms on the diagonal
    diss = gls0 ** (-gls_exp1) * cmu_fac2 * tke0 ** tke_exp2
    # k-kl (MY2.5: p=0, m=1, n=1) wall-proximity function
    # (gls_corstep.F:612-624, Lmy25 branch)
    lmy25 = (p_ == 0.0 and m_ == 1.0 and n_ == 1.0)
    if lmy25:
        Lsc = gls0 ** gls_exp1 * cmu_fac1 * tke0s ** (-tke_exp1)
        d_bot = jnp.maximum(z_w[1:-1] - z_w[:1], _EPS)
        d_top = jnp.maximum(z_w[-1:] - z_w[1:-1], _EPS)
        wall_fac = 1.0 + _GLS_E2 / (vonKar * vonKar) * (Lsc / d_bot) ** 2 \
            + 0.25 / (vonKar * vonKar) * (Lsc / d_top) ** 2
    else:
        wall_fac = 1.0
    BCK_d = Hz_w * (1.0 + dt * diss
                    + dt * jnp.where(neg_K, buoy2_a * akt_ex / tke0s, 0.0))
    BCP_d = Hz_w * (1.0 + dt * m.gls_c2 * wall_fac * diss
                    + dt * jnp.where(neg_P,
                                     gls_c3 * buoy2_a * akt_ex / tke0s,
                                     0.0))

    # vertical diffusion coefficients between interfaces (through layer k)
    FCK = -0.5 * dt * (mix.Akk[1:-1] + mix.Akk[:-2])[1:] / Hz[1:-1]
    FCP = -0.5 * dt * (mix.Akp[1:-1] + mix.Akp[:-2])[1:] / Hz[1:-1]
    # FCK[k] couples unknowns k and k+1 (0-based interior interface idx);
    # reference FCK(i,k) with k=2..N-1 pairs (k-1, k).
    zK = jnp.zeros_like(FCK[:1])
    lowK = jnp.concatenate([zK, FCK], axis=0)
    upK = jnp.concatenate([FCK, zK], axis=0)
    diagK = BCK_d - lowK - upK
    lowP = jnp.concatenate([zK, FCP], axis=0)
    upP = jnp.concatenate([FCP, zK], axis=0)
    diagP = BCP_d - lowP - upP

    # ---- boundary values (Dirichlet at surface/bottom interfaces) -------
    taus = 0.5 * jnp.sqrt((sustr + st.ip1(sustr)) ** 2
                          + (svstr + st.jp1(svstr)) ** 2)
    taub = 0.5 * jnp.sqrt((bustr + st.ip1(bustr)) ** 2
                          + (bvstr + st.jp1(bvstr)) ** 2)
    tke_sfc = jnp.maximum(cmu_fac3 * taus, Kmin)
    tke_bot = jnp.maximum(cmu_fac3 * taub, Kmin)
    gls_sfc = jnp.maximum(gls_fac4 * tke_sfc ** m_
                          * (L_sft * Zos_min) ** n_, Pmin)
    gls_bot = jnp.maximum(gls_fac4 * (vonKar * Zob_min) ** n_
                          * tke_bot ** m_, Pmin)

    # surface psi flux correction applied to the top interior row
    # (gls_corstep.F:741-755): uses tke at the top pair and Akp there.
    cff_t = 0.5 * (tke_sfc + tke_n[-1] / Hz_w[-1])
    gls_fluxt = dt * (cmu0 ** p_) * n_ * cff_t ** m_ * L_sft ** n_ * \
        (Zos_min + 0.5 * Hz[-1]) ** (n_ - 1.0) * \
        0.5 * (mix.Akp[-1] + mix.Akp[-2])
    cff_b = 0.5 * (tke_bot + tke_n[0] / Hz_w[0])
    gls_fluxb = dt * (cmu0 ** p_) * n_ * vonKar ** n_ * cff_b ** m_ * \
        (0.5 * Hz[0] + Zob_min) ** (n_ - 1.0) * \
        0.5 * (mix.Akp[0] + mix.Akp[1])

    gls_rhs = gls_n_.at[-1].add(-gls_fluxt).at[0].add(-gls_fluxb)
    tke_new_i = tridiag_solve(lowK, diagK, upK, tke_n)
    gls_new_i = tridiag_solve(lowP, diagP, upP, gls_rhs)

    tke_new_i = jnp.maximum(tke_new_i, Kmin)
    gls_new_i = jnp.maximum(gls_new_i, Pmin)

    # ---- Galperin limiter + length scale (gls_corstep.F:785-815) --------
    sqrtN = jnp.sqrt(jnp.maximum(0.0, buoy2_a)) + _EPS
    lim = gls_fac5 * tke_new_i ** tke_exp4 * sqrtN ** (-n_)
    if n_ >= 0.0:
        gls_new_i = jnp.minimum(gls_new_i, lim)
    else:
        gls_new_i = jnp.maximum(gls_new_i, lim)
    Ls_unlmt = jnp.maximum(_EPS, gls_new_i ** gls_exp1 * cmu_fac1
                           * tke_new_i ** (-tke_exp1))
    Ls_lmt = jnp.where(
        buoy2_a > 0.0,
        jnp.minimum(Ls_unlmt,
                    jnp.sqrt(0.56 * tke_new_i
                             / (jnp.maximum(0.0, buoy2_a) + _EPS))),
        Ls_unlmt)
    gls_new_i = jnp.maximum(gls_fac4 * tke_new_i ** m_ * Ls_lmt ** n_,
                            Pmin)

    # ---- stability functions --------------------------------------------
    Gh = jnp.minimum(_CA["Gh0"],
                     -buoy2_a * Ls_lmt * Ls_lmt / (2.0 * tke_new_i))
    Gh = jnp.minimum(Gh, Gh - (Gh - _CA["Ghcri"]) ** 2
                     / (Gh + _CA["Gh0"] - 2.0 * _CA["Ghcri"]))
    Gh = jnp.maximum(Gh, _GHMIN)

    stab = getattr(m, "gls_stab", "canuto_a")
    if stab == "canuto_a":
        C = _canuto_a_coeffs()
        Gm = (C["b0"] / gls_fac6 - C["b1"] * Gh
              + C["b3"] * gls_fac6 * Gh ** 2) / \
            (C["b2"] - C["b4"] * gls_fac6 * Gh)
        Gm = jnp.minimum(Gm, shear2 * Ls_lmt * Ls_lmt / (2.0 * tke_new_i))
        cden = (C["b0"] - C["b1"] * gls_fac6 * Gh
                + C["b2"] * gls_fac6 * Gm
                + C["b3"] * gls_fac6 ** 2 * Gh ** 2
                - C["b4"] * gls_fac6 ** 2 * Gh * Gm
                + C["b5"] * gls_fac6 ** 2 * Gm * Gm)
        Sm = (C["s0"] - C["s1"] * gls_fac6 * Gh
              + C["s2"] * gls_fac6 * Gm) / cden
        Sh = (C["s4"] - C["s5"] * gls_fac6 * Gh
              + C["s6"] * gls_fac6 * Gm) / cden
        Sm = jnp.maximum(Sm, 0.0) * sqrt2 / cmu0 ** 3
        Sh = jnp.maximum(Sh, 0.0) * sqrt2 / cmu0 ** 3
    else:  # kantha_clayson
        MY = _MY
        Sh1 = MY["A2"] * (1.0 - 6.0 * MY["A1"] / MY["B1"])
        Sh2 = 3.0 * MY["A2"] * (6.0 * MY["A1"]
                                + MY["B2"] * (1.0 - MY["C3"]))
        Sm2 = 9.0 * MY["A1"] * MY["A2"]
        Sm4 = 18.0 * MY["A1"] ** 2 + 9.0 * MY["A1"] * MY["A2"] \
            * (1.0 - MY["C2"])
        B1pm1o3 = MY["B1"] ** (-1.0 / 3.0)
        Sh = Sh1 / (1.0 - Sh2 * Gh)
        Sm = (B1pm1o3 + Sm4 * Sh * Gh) / (1.0 - Sm2 * Gh)

    ql = sqrt2 * 0.5 * (Ls_lmt * jnp.sqrt(tke_new_i)
                        + mix.Lscale[1:-1] * jnp.sqrt(tke0s))
    Akv_i_new = m.akv_bak + Sm * ql
    Akt_i_new = Sh * ql
    Akk_i_new = m.akk_bak + Sm * ql / m.gls_sigk
    Akp_i_new = m.akp_bak + Sm * ql / m.gls_sigp

    # surface/bottom coefficients
    Akv_sfc = m.akv_bak + L_sft * Zos_min * cmu0 * jnp.sqrt(tke_sfc)
    Akv_bot = m.akv_bak + vonKar * Zob_min * cmu0 * jnp.sqrt(tke_bot)

    def assemble(interior, bot, sfc):
        return jnp.concatenate([bot[None], interior, sfc[None]], axis=0)

    tke_new = assemble(tke_new_i, tke_bot, tke_sfc)
    gls_new = assemble(gls_new_i, gls_bot, gls_sfc)
    Akv_new = assemble(Akv_i_new, Akv_bot, Akv_sfc)
    Akk_new = assemble(Akk_i_new, m.akk_bak + Akv_bot / m.gls_sigk,
                       m.akk_bak + Akv_sfc / m.gls_sigk)
    Akp_new = assemble(Akp_i_new, m.akp_bak + Akv_bot / m.gls_sigp,
                       m.akp_bak + Akv_sfc / m.gls_sigp)
    Akt_new = jnp.stack([
        assemble(m.akt_bak[it] + Akt_i_new,
                 jnp.full_like(tke_bot, m.akt_bak[it]),
                 jnp.full_like(tke_sfc, m.akt_bak[it]))
        for it in range(NAT)])
    Lscale_new = assemble(Ls_lmt, jnp.full_like(tke_bot, 1.0e-6),
                          jnp.full_like(tke_sfc, 1.0e-6))

    tke_new = _bc_w(cfg, tke_new)
    gls_new = _bc_w(cfg, gls_new)
    Akv_new = _bc_w(cfg, Akv_new)
    Akt_new = _bc_w(cfg, Akt_new)
    Akk_new = _bc_w(cfg, Akk_new)
    Akp_new = _bc_w(cfg, Akp_new)

    return MixState(tke=tke_new, tke_prev=mix.tke,
                    gls=gls_new, gls_prev=mix.gls,
                    Akv=Akv_new, Akt=Akt_new, Akk=Akk_new, Akp=Akp_new,
                    Lscale=Lscale_new)


def my25_mixing_config(base=None):
    """Mellor-Yamada level-2.5 closure expressed through GLS.

    The reference implements MY2.5 separately (my25_prestep.F /
    my25_corstep.F); Umlauf & Burchard (2003, Table 1) show it is the
    GLS member with (p, m, n) = (0, 1, 1) -- the k-kl pair -- with
    cmu0 = B1**(-1/3) ~= 0.5544 (B1 = 16.6), Kantha-Clayson stability
    functions and the E2 wall-proximity function (already active in
    gls_corstep for p=0, m=1, n=1).  This helper returns a
    MixingConfig preset so `vmix='gls'` reproduces MY2.5.
    """
    import dataclasses
    from ..config import MixingConfig
    base = base or MixingConfig()
    return dataclasses.replace(
        base, vmix="gls",
        gls_p=0.0, gls_m=1.0, gls_n=1.0,
        gls_cmu0=0.5544,
        gls_c1=0.9, gls_c2=0.52, gls_c3m=2.5, gls_c3p=1.0,
        gls_sigk=1.96, gls_sigp=1.96,
        gls_kmin=5.0e-6, gls_pmin=5.0e-6,
        gls_stab="kantha_clayson")
