"""Wave-current bottom boundary layer closures.

Implements the MB (Meinte Blaas / Soulsby) parametric closure of the
reference's BBL family (ROMS/Nonlinear/BBL/mb_bbl.h):

    tauCW    = tauC * [1 + 1.2*(tauW/(tauC+tauW))^3.2]       (Soulsby 97
    tauCWmax = sqrt((tauCW + tauW cos(phiCW))^2                eqs 69-70)
                    + (tauW sin(phiCW))^2)

with optional bedload-layer roughness (MB_Z0BL, Li & Amos 2001),
sandy-ripple predictor (MB_Z0RIP, Li & Amos 2001) and biogenic silty
ripples (MB_Z0BIO, Harris & Wiberg 2001).  Wave orbital velocity at the
bed comes either from linear theory via the Dean & Dalrymple (1991)
6th-degree wave-number polynomial (MB_CALC_UB) or directly from a
supplied Uwave_rms field.

The SSW (Sherwood/Signell/Warner) closure is implemented via the
Madsen (1994) wave-current solution (`madsen94` + `ssw_bbl`); the SG
(Styles & Glenn 2000) closure solves the Kelvin-function consistency
relation by bisection (`sg_bbl`, sg_bbl.h analog, below).

All IF-trees become jnp.where ladders over whole arrays; ripple
geometry (rlen, rhgt) is prognostic state threaded by the caller.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp

from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st

_VONKAR = 0.41          # mod_scalars.F:469
_EPS = 1.0e-10          # mb_bbl.h:229
# Dean & Dalrymple wave-number polynomial (mb_bbl.h:222-227)
_K1, _K2, _K3 = 0.6666666666, 0.3555555555, 0.1608465608
_K4, _K5, _K6 = 0.0632098765, 0.0217540484, 0.0065407983
# Soulsby (1995) wave friction coefficients (mb_bbl.h:230-234)
_SCF1 = 0.5 * 1.39
_SCF2 = 0.52
_SCF3 = 2.0 - _SCF2
_SCF4 = 1.2
_SCF5 = 3.2


@dataclass(frozen=True)
class BBLConfig:
    """Sediment/bed parameters for the BBL closure (sediment.in +
    ana_sediment defaults)."""
    d50: float = 2.0e-4          # median grain diameter (m)
    srho: float = 2650.0         # grain density (kg/m3)
    tau_cb: float = 1.44e-4      # critical stress (m2/s2, kinematic)
    wsed: float = 0.01           # settling velocity (m/s)
    calc_ub: bool = True         # MB_CALC_UB: Ub from Hwave via
    #                              linear theory, else Uwave_rms given
    z0bl: bool = True            # MB_Z0BL bedload roughness
    z0rip: bool = True           # MB_Z0RIP sandy ripple predictor
    z0bio: bool = False          # MB_Z0BIO biogenic ripples
    Cdb_min: float = 1.0e-6
    Cdb_max: float = 0.5


class BBLState(NamedTuple):
    rlen: jnp.ndarray            # ripple length (m)
    rhgt: jnp.ndarray            # ripple height (m)


class BBLOut(NamedTuple):
    bustr: jnp.ndarray           # kinematic bottom stress (m2/s2), u-pt
    bvstr: jnp.ndarray
    tauCWmax: jnp.ndarray        # max combined skin stress for sediment
    Ab: jnp.ndarray              # orbital excursion amplitude (m)
    state: BBLState


def initial_bbl(cfg: ModelConfig, rlen0: float = 0.10,
                rhgt0: float = 0.01) -> BBLState:
    shp = cfg.shape2d
    return BBLState(rlen=jnp.full(shp, rlen0, cfg.dtype),
                    rhgt=jnp.full(shp, rhgt0, cfg.dtype))


def mb_bbl(cfg: ModelConfig, bblc: BBLConfig, grid: Grid, bstate,
           u, v, rho1, z_r, z_w, Hwave, Dwave, Pwave,
           Uwave_rms=None):
    """MB wave-current BBL (mb_bbl.h:236-620).

    u, v: 3D velocities (bottom level used); rho1: bottom-level density
    anomaly; Hwave/Dwave/Pwave: significant height (m), direction
    (radians), bottom period (s).  Returns BBLOut.
    """
    g = cfg.g
    twopi = 2.0 * jnp.pi
    rlen0, rhgt0 = bstate.rlen, bstate.rhgt

    Zr = z_r[0] - z_w[0]
    rhoW = rho1 + 1000.0
    visc = 0.0013 / rhoW

    # ---- wave orbital velocity at the bed (mb_bbl.h:305-330) -----------
    Fw = twopi / jnp.maximum(Pwave, 0.05)
    if bblc.calc_ub or Uwave_rms is None:
        h = grid.h
        Kdh = h * Fw * Fw / g
        Kbh2 = Kdh * Kdh + Kdh / (
            1.0 + Kdh * (_K1 + Kdh * (_K2 + Kdh * (
                _K3 + Kdh * (_K4 + Kdh * (_K5 + _K6 * Kdh))))))
        Kbh = jnp.sqrt(Kbh2)
        Ab = 0.5 * Hwave / jnp.sinh(Kbh) + _EPS
        Ub = Fw * Ab
    else:
        Ub = Uwave_rms
        Ab = Ub / Fw + _EPS

    # ---- bottom current at rho points (mb_bbl.h:333-349) ---------------
    Ucur = 0.5 * (u[0] + st.ip1(u[0]))
    Vcur = 0.5 * (v[0] + st.jp1(v[0]))
    Umag = jnp.sqrt(Ucur ** 2 + Vcur ** 2) + _EPS
    phiC = jnp.arctan2(Vcur, Ucur)
    angler = getattr(grid, "angler", None)
    ang = angler if angler is not None else jnp.zeros_like(Umag)
    phiCW = 1.5 * jnp.pi - Dwave - phiC - ang

    # ---- roughness & critical stresses (mb_bbl.h:352-380) --------------
    d50 = bblc.d50
    rhoSed = bblc.srho / rhoW
    tau_cb = bblc.tau_cb
    tau_up = 0.172 * (rhoSed - 1.0) * g * d50 ** 0.624
    tau_bf = 0.79 * visc ** (-0.6) * \
        ((rhoSed - 1.0) * g) ** 0.3 * d50 ** 0.9 * tau_cb
    ZnotC0 = d50 / 12.0
    Znot = jnp.maximum(cfg.drag.Zob, ZnotC0)

    def log_drag(z0):
        c = _VONKAR / jnp.log(Zr / z0)
        return c * c

    # current-only stresses (mb_bbl.h:383-391)
    tauC = jnp.clip(log_drag(Znot), bblc.Cdb_min, bblc.Cdb_max) * \
        Umag ** 2
    tau_cs = log_drag(ZnotC0) * Umag ** 2

    def soulsby(tw, tc):
        """tauCW and tauCWmax (Soulsby 97 eqs 69-70)."""
        tcw = tc * (1.0 + _SCF4 * (tw / (tw + tc + _EPS)) ** _SCF5)
        tmax = jnp.sqrt((tcw + tw * jnp.cos(phiCW)) ** 2 +
                        (tw * jnp.sin(phiCW)) ** 2)
        return tcw, tmax

    def tau_wave(z0):
        return _SCF1 * (z0 * Fw) ** _SCF2 * Ub ** _SCF3

    # ---- wave-current branch (mb_bbl.h:398-540) ------------------------
    tau_w_skin = tau_wave(ZnotC0)
    _, tau_cws = soulsby(tau_w_skin, tau_cs)
    tauCWmax = tau_cws
    ZnotC = ZnotC0

    if bblc.z0bl:
        # bedload-layer roughness (Li & Amos 2001; mb_bbl.h:420-446)
        tau_ex = jnp.maximum(tau_cws - tau_cb, 0.0)
        cffb = 1.0 / ((rhoSed - 1.0) * g * d50)
        ZnotC = ZnotC + 17.4 * d50 * (cffb * tau_ex) ** 0.75
        tau_c_bl = log_drag(ZnotC) * Umag ** 2
        tau_wb = tau_wave(ZnotC)
        _, tau_cwb = soulsby(tau_wb, tau_c_bl)
        tauCWmax = tau_cwb
    else:
        tau_cwb = tau_cws

    rlen, rhgt = rlen0, rhgt0
    if bblc.z0rip:
        # sandy ripple predictor (Li & Amos 2001; mb_bbl.h:449-491)
        RHmin, RLmin = 0.001, 0.01
        RHmax = 0.8 * rlen0 / jnp.pi
        rh = jnp.clip(rhgt0, RHmin, RHmax)
        tau_en = jnp.maximum(
            tau_cws, tau_cws * (rlen0 / (rlen0 - jnp.pi * rh)) ** 2)
        rh_loc = (19.6 * jnp.sqrt(tau_cws / tau_cb) + 20.9) * d50
        rh_eq = (22.15 * jnp.sqrt(tau_cwb / tau_cb) + 6.38) * d50
        rl_brk = 535.0 * d50
        rh_brk = 0.15 * rl_brk * \
            (jnp.sqrt(tau_up) - jnp.sqrt(tau_cwb)) / \
            (jnp.sqrt(tau_up) - jnp.sqrt(tau_bf) + _EPS)
        cond_loc = (tau_cws < tau_cb) & (tau_en >= tau_cb)
        cond_eq = (tau_cws >= tau_cb) & (tau_cwb < tau_bf)
        cond_brk = (tau_cwb >= tau_bf) & (tau_cwb < tau_up)
        cond_sheet = tau_cwb >= tau_up
        rhgt = jnp.where(
            cond_loc, rh_loc,
            jnp.where(cond_eq, rh_eq,
                      jnp.where(cond_brk, rh_brk,
                                jnp.where(cond_sheet, 0.0, rhgt0))))
        rlen = jnp.where(
            cond_loc, rh_loc / 0.12,
            jnp.where(cond_eq, rh_eq / 0.12,
                      jnp.where(cond_brk, rl_brk,
                                jnp.where(cond_sheet, 0.0, rlen0))))
        if d50 < 0.000063:       # predictor only for sandy beds
            rlen, rhgt = rlen0, rhgt0

    if bblc.z0bio and bblc.d50 < 0.000063:
        # biogenic ripples for silt (Harris & Wiberg 2001;
        # mb_bbl.h:494-512)
        RLbio = 0.1
        RHbiofac = 1.0 / jnp.exp(4.11)
        thetw = tau_cws / ((rhoSed - 1.0) * g * d50)
        rhgt = jnp.minimum(thetw ** (-1.67) * RLbio * RHbiofac, 0.006)
        rlen = jnp.full_like(rhgt, RLbio)

    if bblc.z0rip or bblc.z0bio:
        # Grant & Madsen (1982) ripple roughness (mb_bbl.h:519-523)
        ZnotC = ZnotC + 0.92 * rhgt * rhgt / jnp.maximum(rlen, 0.01)

    # total-roughness flow stresses (mb_bbl.h:525-546)
    tau_c_tot = log_drag(ZnotC) * Umag ** 2
    tau_w_tot = tau_wave(ZnotC)
    tauCW_wave, _ = soulsby(tau_w_tot, tau_c_tot)

    # ---- current-only branch (mb_bbl.h:548-580) ------------------------
    if bblc.z0rip:
        # current-only ripple regimes (Yalin 1964; mb_bbl.h:558-572)
        rl_y = 1000.0 * d50
        rh_y = 0.0308 * rl_y ** 1.19
        sheet_c = tau_cs > tau_up
        calm_c = tau_cs < tau_cb
        rlen_cur = jnp.where(sheet_c, 0.0,
                             jnp.where(calm_c, rlen0, rl_y))
        rhgt_cur = jnp.where(sheet_c, 0.0,
                             jnp.where(calm_c, rhgt0, rh_y))
        ZnotC_cur = ZnotC0 + 0.92 * rhgt_cur ** 2 / \
            jnp.maximum(rlen_cur, 0.01)
    else:
        rlen_cur, rhgt_cur = rlen0, rhgt0
        ZnotC_cur = ZnotC0
    tauCW_cur = jnp.clip(log_drag(ZnotC_cur), bblc.Cdb_min,
                         bblc.Cdb_max) * Umag ** 2
    waves = Ub > 0.01
    tauCW = jnp.where(waves, tauCW_wave, tauCW_cur)
    tauCWmax = jnp.where(waves, tauCWmax, tauC)
    rlen = jnp.where(waves, rlen, rlen_cur)
    rhgt = jnp.where(waves, rhgt, rhgt_cur)

    # ---- stress components at u/v points (mb_bbl.h:590-620) ------------
    angleC_u = u[0] / (0.5 * (st.im1(Umag) + Umag))
    bustr = 0.5 * (st.im1(tauCW) + tauCW) * angleC_u
    angleC_v = v[0] / (0.5 * (st.jm1(Umag) + Umag))
    bvstr = 0.5 * (st.jm1(tauCW) + tauCW) * angleC_v
    if cfg.wetdry:
        lim_u = 0.75 * 0.5 * ((z_w[1] + st.im1(z_w[1])) -
                              (z_w[0] + st.im1(z_w[0]))) / cfg.dt
        bustr = jnp.sign(bustr) * jnp.minimum(
            jnp.abs(bustr), jnp.abs(u[0]) * lim_u)
        lim_v = 0.75 * 0.5 * ((z_w[1] + st.jm1(z_w[1])) -
                              (z_w[0] + st.jm1(z_w[0]))) / cfg.dt
        bvstr = jnp.sign(bvstr) * jnp.minimum(
            jnp.abs(bvstr), jnp.abs(v[0]) * lim_v)

    return BBLOut(bustr=bustr, bvstr=bvstr, tauCWmax=tauCWmax, Ab=Ab,
                  state=BBLState(rlen=rlen, rhgt=rhgt))


def make_bbl_fn(cfg: ModelConfig, bblc: BBLConfig, grid: Grid,
                wave_fn):
    """Wrap mb_bbl as a bottom-stress hook: wave_fn(time) must return
    (Hwave, Dwave, Pwave) fields."""
    def fn(time, bstate, u, v, rho1, z_r, z_w, waves=None):
        if waves is not None:
            # coupled-import wave fields (mct_roms_swan.h exchange)
            Hw, Dw, Pw = (waves["Hwave"], waves["Dwave"],
                          waves["Pwave"])
        else:
            Hw, Dw, Pw = wave_fn(time)
        return mb_bbl(cfg, bblc, grid, bstate, u, v, rho1, z_r, z_w,
                      Hw, Dw, Pw)
    return fn


def madsen94(ubr, wr, ucr, zr, phiwc, kN, niter: int = 12):
    """Madsen (1994) wave-current bottom boundary layer solution
    (ssw_bbl.h:1532-1735, CRS_FIX variant), vectorized with a fixed
    iteration count (the reference iterates to 5e-6 relative change in
    fwc; ~6 iterations suffice, 12 is safely converged).

    ubr: wave orbital velocity (m/s); wr: wave radian frequency;
    ucr: current speed at height zr; phiwc: wave-current angle; kN:
    bottom roughness (30*zo).  Returns (ustrc, ustrwm, ustrr, fwc,
    zoa): current/wave-max/combined friction velocities, wave friction
    factor and apparent roughness.
    """
    vonKar = _VONKAR
    eps = 1.0e-12
    kN = jnp.minimum(kN, 0.9 * zr)                 # CRS_FIX
    zo = kN / 30.0
    cosphiwc = jnp.abs(jnp.cos(phiwc))
    ubr_s = jnp.maximum(ubr, 1.0e-3)               # safe value in the
    wr_s = jnp.maximum(wr, 1.0e-6)                 # no-wave branch

    def fw_of(Cmu):
        cukw = Cmu * ubr_s / (kN * wr_s)
        f = Cmu * 0.3
        f = jnp.where((cukw > 0.352) & (cukw <= 100.0),
                      Cmu * jnp.exp(7.02 * cukw ** (-0.078) - 8.82), f)
        f = jnp.where(cukw > 100.0,
                      Cmu * jnp.exp(5.61 * cukw ** (-0.109) - 7.30), f)
        return f, cukw

    def one(ustrc2_prev, ustrwm2_prev):
        rmu = ustrc2_prev / jnp.maximum(ustrwm2_prev, eps)
        Cmu = jnp.sqrt(1.0 + 2.0 * rmu * cosphiwc + rmu * rmu)  # Eq 27
        fwc, cukw = fw_of(Cmu)
        ustrwm2 = 0.5 * fwc * ubr_s * ubr_s                     # Eq 29
        ustrr = jnp.sqrt(Cmu * ustrwm2)                         # Eq 26
        dwc = jnp.where(cukw >= 8.0,
                        jnp.minimum(0.9 * zr,
                                    2.0 * vonKar * ustrr / wr_s), kN)
        lnzr = jnp.log(zr / dwc)
        lndw = jnp.log(dwc / zo)
        bigsqr = -1.0 + jnp.sqrt(
            1.0 + (4.0 * vonKar * lndw / (lnzr * lnzr)) *
            ucr / jnp.maximum(ustrr, eps))
        ustrc = 0.5 * ustrr * (lnzr / lndw) * bigsqr            # Eq 38
        return ustrc ** 2, ustrwm2, ustrr, fwc, dwc

    ustrc2 = jnp.zeros_like(ubr_s)
    fwc0, _ = fw_of(jnp.ones_like(ubr_s))
    ustrwm2 = 0.5 * fwc0 * ubr_s * ubr_s
    for _ in range(niter):
        ustrc2, ustrwm2, ustrr, fwc, dwc = one(ustrc2, ustrwm2)
    ustrc = jnp.sqrt(ustrc2)
    zoa = jnp.exp(jnp.log(dwc)
                  - (ustrc / jnp.maximum(ustrr, eps))
                  * jnp.log(dwc / zo))                          # Eq 11

    # degenerate branches (ssw_bbl.h:1566-1580): no waves -> pure
    # log-layer current; no motion -> zero
    ustrc_nw = ucr * vonKar / jnp.log(zr / zo)
    nowave = ubr <= 0.01
    nocur = ucr <= 0.01
    ustrc = jnp.where(nowave, jnp.where(nocur, 0.0, ustrc_nw), ustrc)
    ustrwm = jnp.where(nowave, 0.0, jnp.sqrt(ustrwm2))
    ustrr = jnp.where(nowave, ustrc, ustrr)
    fwc = jnp.where(nowave, 0.0, fwc)
    zoa = jnp.where(nowave, kN, zoa)
    return ustrc, ustrwm, ustrr, fwc, zoa


def ssw_bbl(cfg: ModelConfig, bblc: BBLConfig, grid: Grid, bstate,
            u, v, rho1, z_r, z_w, Hwave, Dwave, Pwave,
            Uwave_rms=None):
    """SSW wave-current BBL (ssw_bbl.h:113-1078 reduced to the M94WC
    path): Madsen 94 solution on grain + ripple roughness, ripple
    geometry carried as state (shared predictor with mb_bbl).
    Returns BBLOut (same interface as mb_bbl)."""
    twopi = 2.0 * jnp.pi
    Zr = z_r[0] - z_w[0]

    Fw = twopi / jnp.maximum(Pwave, 0.05)
    h = grid.h
    Kdh = h * Fw * Fw / cfg.g
    Kbh2 = Kdh * Kdh + Kdh / (
        1.0 + Kdh * (_K1 + Kdh * (_K2 + Kdh * (
            _K3 + Kdh * (_K4 + Kdh * (_K5 + _K6 * Kdh))))))
    Ab = 0.5 * Hwave / jnp.sinh(jnp.sqrt(Kbh2)) + _EPS
    Ub = Fw * Ab if Uwave_rms is None else Uwave_rms

    Ucur = 0.5 * (u[0] + st.ip1(u[0]))
    Vcur = 0.5 * (v[0] + st.jp1(v[0]))
    Umag = jnp.sqrt(Ucur ** 2 + Vcur ** 2) + _EPS
    phiC = jnp.arctan2(Vcur, Ucur)
    angler = getattr(grid, "angler", None)
    ang = angler if angler is not None else jnp.zeros_like(Umag)
    phiwc = 1.5 * jnp.pi - Dwave - phiC - ang

    # roughness: grain + Grant-Madsen ripple contribution from the
    # previous ripple state (N92_RIPRUF)
    kN_grain = 30.0 * jnp.maximum(cfg.drag.Zob, bblc.d50 / 12.0)
    kN = kN_grain + 30.0 * 0.92 * bstate.rhgt ** 2 / \
        jnp.maximum(bstate.rlen, 0.01)

    ustrc, ustrwm, ustrr, fwc, zoa = madsen94(
        Ub, Fw, Umag, Zr, phiwc, kN)

    tauC = ustrc ** 2                              # kinematic m2/s2
    tauCWmax = ustrr ** 2

    # ripple predictor reuses the Li & Amos regimes on the SSW
    # stresses (ssw_bbl.h sediment ripples section)
    rhoW = rho1 + 1000.0
    rhoSed = bblc.srho / rhoW
    tau_up = 0.172 * (rhoSed - 1.0) * cfg.g * bblc.d50 ** 0.624
    rl_y = 535.0 * bblc.d50
    rh_eq = (22.15 * jnp.sqrt(tauCWmax / bblc.tau_cb) + 6.38) * \
        bblc.d50
    active = tauCWmax >= bblc.tau_cb
    sheet = tauCWmax >= tau_up
    rhgt = jnp.where(sheet, 0.0,
                     jnp.where(active, rh_eq, bstate.rhgt))
    rlen = jnp.where(sheet, 0.0,
                     jnp.where(active, rh_eq / 0.12, bstate.rlen))

    angleC_u = u[0] / (0.5 * (st.im1(Umag) + Umag))
    bustr = 0.5 * (st.im1(tauC) + tauC) * angleC_u
    angleC_v = v[0] / (0.5 * (st.jm1(Umag) + Umag))
    bvstr = 0.5 * (st.jm1(tauC) + tauC) * angleC_v
    return BBLOut(bustr=bustr, bvstr=bvstr, tauCWmax=tauCWmax, Ab=Ab,
                  state=BBLState(rlen=rlen, rhgt=rhgt))


def make_ssw_bbl_fn(cfg: ModelConfig, bblc: BBLConfig, grid: Grid,
                    wave_fn):
    """SSW variant of make_bbl_fn."""
    def fn(time, bstate, u, v, rho1, z_r, z_w, waves=None):
        if waves is not None:
            # coupled-import wave fields (mct_roms_swan.h exchange)
            Hw, Dw, Pw = (waves["Hwave"], waves["Dwave"],
                          waves["Pwave"])
        else:
            Hw, Dw, Pw = wave_fn(time)
        return ssw_bbl(cfg, bblc, grid, bstate, u, v, rho1, z_r, z_w,
                       Hw, Dw, Pw)
    return fn


# ---------------------------------------------------------------------------
# SG (Styles & Glenn 2000) wave-current BBL (ROMS/Nonlinear/BBL/sg_bbl.h)
# ---------------------------------------------------------------------------
# Two-layer linear/constant eddy-viscosity wave boundary layer solved
# with Kelvin functions; the wave/current stress partition is found by
# bisection of the Styles-Glenn consistency relation.  Constants from
# mod_scalars.F:1534-1551.

SG_ALPHA = 1.0
SG_KAPPA = 0.41
SG_NU = 1.19e-6
SG_TOL = 1.0e-4
SG_N = 20
SG_Z1P = SG_ALPHA
SG_Z100 = 1.0
_SG_MP = complex((1.0 / (2.0 * SG_Z1P)) ** 0.5,
                 (1.0 / (2.0 * SG_Z1P)) ** 0.5)


def _kelvin8m(x):
    """Kelvin functions ber/bei/ker/kei (+derivatives) for x <= 8
    (sg_kelvin8m, Abramowitz & Stegun series)."""
    import numpy as np
    c = 0.125 * x
    xp = {1: c}
    for i in range(2, 29):
        xp[i] = xp[i - 1] * c
    xhalf = 0.5 * x
    pi = np.pi
    ber = (1.0 - 64.0 * xp[4] + 113.77777774 * xp[8]
           - 32.36345652 * xp[12] + 2.64191397 * xp[16]
           - 0.08349609 * xp[20] + 0.00122552 * xp[24]
           - 0.00000901 * xp[28])
    bei = (16.0 * xp[2] - 113.77777774 * xp[6] + 72.81777742 * xp[10]
           - 10.56765779 * xp[14] + 0.52185615 * xp[18]
           - 0.01103667 * xp[22] + 0.00011346 * xp[26])
    ker = (-ber * jnp.log(xhalf) + 0.25 * pi * bei - 0.57721566
           - 59.05819744 * xp[4] + 171.36272133 * xp[8]
           - 60.60977451 * xp[12] + 5.65539121 * xp[16]
           - 0.19636347 * xp[20] + 0.00309699 * xp[24]
           - 0.00002458 * xp[28])
    kei = (-bei * jnp.log(xhalf) - 0.25 * pi * ber
           + 6.76454936 * xp[2] - 142.91827687 * xp[6]
           + 124.23569650 * xp[10] - 21.30060904 * xp[14]
           + 1.17509064 * xp[18] - 0.02695875 * xp[22]
           + 0.00029532 * xp[26])
    berp = x * (-4.0 * xp[2] + 14.22222222 * xp[6] - 6.06814810 * xp[10]
                + 0.66047849 * xp[14] - 0.02609253 * xp[18]
                + 0.00045957 * xp[22] - 0.00000394 * xp[26])
    beip = x * (0.5 - 10.66666666 * xp[4] + 11.37777772 * xp[8]
                - 2.31167514 * xp[12] + 0.14677204 * xp[16]
                - 0.00379386 * xp[20] + 0.00004609 * xp[24])
    kerp = (-berp * jnp.log(xhalf) - ber / x + 0.25 * pi * beip
            + x * (-3.69113734 * xp[2] + 21.42034017 * xp[6]
                   - 11.36433272 * xp[10] + 1.41384780 * xp[14]
                   - 0.06136358 * xp[18] + 0.00116137 * xp[22]
                   - 0.00001075 * xp[26]))
    keip = (-beip * jnp.log(xhalf) - bei / x - 0.25 * pi * berp
            + x * (0.21139217 - 13.39858846 * xp[4]
                   + 19.41182758 * xp[8] - 4.65950823 * xp[12]
                   + 0.33049424 * xp[16] - 0.00926707 * xp[20]
                   + 0.00011997 * xp[24]))
    return ber, bei, ker, kei, berp, beip, kerp, keip


def _kelvin8p(x):
    """Kelvin functions for x > 8 (sg_kelvin8p asymptotics)."""
    import numpy as np
    pi = np.pi
    c = 8.0 / x
    xps = {1: c}
    xms = {1: -c}
    for i in range(2, 7):
        xps[i] = xps[i - 1] * c
        xms[i] = -xms[i - 1] * c

    def series(coeffs, xs):
        out = coeffs[0]
        for i in range(1, 7):
            out = out + coeffs[i] * xs[i]
        return out

    th = [complex(0.0, -0.3926991), complex(0.0110486, -0.0110485),
          complex(0.0, -0.0009765), complex(-0.0000906, -0.0000901),
          complex(-0.0000252, 0.0), complex(-0.0000034, 0.0000051),
          complex(0.0000006, 0.0000019)]
    ph = [complex(0.7071068, 0.7071068), complex(-0.0625001, -0.0000001),
          complex(-0.0013813, 0.0013811), complex(0.0000005, 0.0002452),
          complex(0.0000346, 0.0000338), complex(0.0000117, -0.0000024),
          complex(0.0000016, -0.0000032)]
    thetap = series(th, xps)
    thetam = series(th, xms)
    phip = series(ph, xps)
    phim = series(ph, xms)
    cf = x / (2.0 ** 0.5)
    argm = -cf * (1.0 + 1.0j) + thetam
    fofx = jnp.sqrt(pi / (2.0 * x)) * jnp.exp(argm)
    ker = jnp.real(fofx)
    kei = jnp.imag(fofx)
    argp = cf * (1.0 + 1.0j) + thetap
    gofx = 1.0 / jnp.sqrt(2.0 * pi * x) * jnp.exp(argp)
    ber = jnp.real(gofx) - kei / pi
    bei = jnp.imag(gofx) + ker / pi
    kerp = jnp.real(-fofx * phim)
    keip = jnp.imag(-fofx * phim)
    berp = jnp.real(gofx * phip) - keip / pi
    beip = jnp.imag(gofx * phip) + kerp / pi
    return ber, bei, ker, kei, berp, beip, kerp, keip


def _kelvin(x):
    """Branch-selected Kelvin functions, vectorized and NaN-safe."""
    xs = jnp.clip(x, 1.0e-8, 8.0)
    xl = jnp.maximum(x, 8.0)
    small = _kelvin8m(xs)
    large = _kelvin8p(xl)
    sel = x <= 8.0
    return tuple(jnp.where(sel, a, b) for a, b in zip(small, large))


def _sg_phi(znotp):
    """|gamma| of the two-layer wave solution (sg_bstress.h Kelvin
    combination); znotp: ratio of roughness over BL height scale."""
    ber0, bei0, ker0, kei0, berp0, beip0, kerp0, keip0 = \
        _kelvin(2.0 * jnp.sqrt(znotp))
    cff0 = 1.0 / jnp.sqrt(znotp)
    bnot = ber0 + 1j * bei0
    knot = ker0 + 1j * kei0
    bnotp = (berp0 + 1j * beip0) * cff0
    knotp = (kerp0 + 1j * keip0) * cff0

    import numpy as np
    x1 = 2.0 * np.sqrt(SG_Z1P)
    b1r, b1i, k1r, k1i, b1pr, b1pi, k1pr, k1pi = [
        float(np.asarray(v)) for v in _kelvin(jnp.asarray(x1))]
    cff1 = 1.0 / np.sqrt(SG_Z1P)
    b1 = complex(b1r, b1i)
    k1 = complex(k1r, k1i)
    b1p = complex(b1pr, b1pi) * cff1
    k1p = complex(k1pr, k1pi) * cff1
    ll = _SG_MP * b1 + b1p
    nn = _SG_MP * k1 + k1p
    argi = bnotp * nn / (bnot * nn - knot * ll) + \
        knotp * ll / (knot * ll - bnot * nn)
    gammai = -SG_KAPPA * znotp * argi
    phi_big = jnp.abs(gammai)
    phi_small = abs(-SG_KAPPA * SG_Z1P * _SG_MP)
    return jnp.where(SG_Z1P / znotp > 1.0, phi_big, phi_small)


def _sg_stress_ratios(row, phicw, ubouc):
    """phi-limited ubouc, mu, epsilon, ro (sg_bstress first half)."""
    phi = None
    for _ in range(4):               # reference: usually one pass
        ro = row / ubouc
        znotp = 1.0 / (SG_KAPPA * ro)
        phi = _sg_phi(znotp)
        ubouc = jnp.minimum(ubouc, 1.0 / phi)
    ro = row / ubouc
    mu = jnp.sqrt(ubouc * phi)
    mu2 = mu * mu
    cosphi = jnp.abs(jnp.cos(phicw))
    eps2 = -mu2 * cosphi + jnp.sqrt(jnp.maximum(
        1.0 + mu2 * mu2 * (cosphi * cosphi - 1.0), 0.0))
    epsilon = jnp.where(jnp.abs(mu - 1.0) < 1e-12, 0.0,
                        jnp.sqrt(jnp.maximum(eps2, 0.0)))
    return ubouc, mu, epsilon, ro


def _sg_fofx(zrozn, ubokur, ubouc, epsilon, ro):
    """Root function of the SG consistency relation (sg_bstress
    IF-ladder, sg_bbl.h:846-869) as a where ladder."""
    e = jnp.maximum(epsilon, 1.0e-12)
    ror = ro / zrozn
    zroz1 = 1.0 / (SG_ALPHA * SG_KAPPA * ror)
    zroz2 = e * zroz1
    z1ozn = SG_ALPHA * SG_KAPPA * ro
    z2ozn = z1ozn / e
    c1 = (zroz2 > 1.0) & (z1ozn > 1.0)
    c2 = (zroz2 <= 1.0) & (zroz1 > 1.0) & (z1ozn > 1.0)
    c3 = (zroz1 <= 1.0) & (z1ozn > 1.0)
    c4 = (zroz2 > 1.0) & (z1ozn <= 1.0) & (z2ozn > 1.0)
    c5 = (zroz2 <= 1.0) & (zroz1 > 1.0) & (z1ozn <= 1.0) & (z2ozn > 1.0)
    c6 = (zroz2 > 1.0) & (z2ozn <= 1.0)
    safe = lambda v: jnp.log(jnp.maximum(v, 1.0e-12))
    f1 = ubokur * e * (safe(zroz2) + 1.0 - e + e * safe(z1ozn))
    f2 = ubokur * e * e * (zroz1 - 1.0 + safe(z1ozn))
    f3 = ubokur * e * e * safe(zrozn)
    f4 = ubokur * e * (safe(zroz2) + 1.0 - 1.0 / z2ozn)
    f5 = ubokur * e * e * (zroz1 - 1.0 / z1ozn)
    f6 = ubokur * e * safe(zrozn)
    fofx = jnp.where(c1, f1, jnp.where(c2, f2, jnp.where(
        c3, f3, jnp.where(c4, f4, jnp.where(c5, f5, f6)))))
    return -ubouc + fofx


def sg_bbl(cfg: ModelConfig, bblc: BBLConfig, grid: Grid, bstate,
           u, v, rho1, z_r, z_w, Hwave, Dwave, Pwave, Uwave_rms=None,
           calc_znot: bool = True):
    """Styles & Glenn (2000) wave-current BBL (sg_bbl.h), vectorized:
    bisection of the stress-partition relation replaces the scalar
    per-point loop; all Kelvin-function branches computed with
    jnp.where selection.  Returns BBLOut."""
    g = cfg.g
    twopi = 2.0 * jnp.pi
    Zr = jnp.maximum(z_r[0] - z_w[0], 1.0e-3)
    rhoW = rho1 + 1000.0

    # ---- wave number via fixed-iteration Newton-Raphson ----------------
    Fw = twopi / jnp.maximum(Pwave, 0.05)
    h = grid.h
    if Uwave_rms is None:
        Kb0 = Fw * Fw / g
        Kb = jnp.where(Kb0 * h >= 1.0, Kb0, Fw / jnp.sqrt(g * h))
        for _ in range(SG_N):
            Kbh = Kb * h
            KboKb0 = Kb / Kb0
            Kdelta = (1.0 - KboKb0 * jnp.tanh(Kbh)) / \
                (1.0 + Kbh * (KboKb0 - 1.0 / KboKb0))
            Kb = Kb * (1.0 + Kdelta)
        Ab = 0.5 * Hwave / jnp.sinh(Kb * h) + _EPS
        Ub = Fw * Ab + _EPS
    else:
        Ub = jnp.abs(Uwave_rms) + _EPS
        Ab = Ub / Fw + _EPS

    # ---- bottom current and wave-current angle --------------------------
    Ucur = 0.5 * (u[0] + st.ip1(u[0]))
    Vcur = 0.5 * (v[0] + st.jp1(v[0]))
    Umag = jnp.sqrt(Ucur ** 2 + Vcur ** 2) + _EPS
    phiC = jnp.arctan2(Vcur, Ucur)
    angler = getattr(grid, "angler", None)
    ang = angler if angler is not None else jnp.zeros_like(Umag)
    phicw = 1.5 * jnp.pi - Dwave - phiC - ang

    # ---- roughness + ripple geometry (SG_CALC_ZNOT) ---------------------
    dd = bblc.d50
    ss = bblc.srho / rhoW
    chi = 4.0 * SG_NU * Ub * Ub / \
        (dd * ((ss - 1.0) * g * dd) ** 1.5)
    if calc_znot:
        star = dd / (4.0 * SG_NU) * jnp.sqrt((ss - 1.0) * g * dd)
        shldcr = jnp.where(
            star <= 1.5, 0.0932 * star ** (-0.707),
            jnp.where(star < 4.0, 0.0848 * star ** (-0.473),
                      jnp.where(star < 10.0, 0.0680 * star ** (-0.314),
                                jnp.where(star < 34.0, 0.033,
                                          jnp.where(star < 270.0,
                                                    0.0134 * star ** 0.255,
                                                    0.056)))))
        abokb = Ab / dd
        fwm = jnp.where(abokb <= 100.0,
                        jnp.exp(7.02 * abokb ** (-0.078) - 8.82),
                        jnp.exp(5.61 * abokb ** (-0.109) - 7.30))
        ustarwm = jnp.sqrt(0.5 * fwm) * Ub
        shld = ustarwm * ustarwm / ((ss - 1.0) * dd * g)
        moving = shld / shldcr > 1.0
        eta_m = jnp.where(chi <= 2.0, Ab * 0.30 * chi ** (-0.39),
                          Ab * 0.45 * chi ** (-0.99))
        lam_m = jnp.where(chi <= 2.0, Ab * 1.96 * chi ** (-0.28),
                          Ab * 2.71 * chi ** (-0.75))
        kbs = Ab * 0.0655 * (Ub * Ub / ((ss - 1.0) * g * Ab)) ** 1.4
        znot = jnp.where(moving, (dd + 2.3 * eta_m + kbs) / 30.0,
                         cfg.drag.Zob)
        eta = jnp.where(moving, eta_m, 0.0)
        lam = jnp.where(moving, lam_m, 0.0)
    else:
        znot = jnp.full_like(Umag, cfg.drag.Zob)
        eta = jnp.where(chi <= 2.0, Ab * 0.32 * chi ** (-0.34),
                        Ab * 0.52 * chi ** (-1.01))
        lam = jnp.where(chi <= 2.0, Ab * 2.04 * chi ** (-0.23),
                        Ab * 2.7 * chi ** (-0.78))

    # ---- default log-profile current stress -----------------------------
    cff1 = _VONKAR / jnp.log(Zr / jnp.maximum(cfg.drag.Zob, 1e-6))
    Cd = jnp.clip(cff1 * cff1, bblc.Cdb_min, bblc.Cdb_max)
    Tauc0 = Cd * Umag * Umag

    # ---- Styles-Glenn stress partition (bisection) ----------------------
    zrozn = Zr / znot
    active = (Umag > _EPS) & (Ub > 2.0 * _EPS) & (zrozn > 1.0)
    ubokur = Ub / (SG_KAPPA * Umag)
    row = Ab / znot
    # maximum wave/combined stress ratio from the pure-wave solution
    abokb30 = Ab / (30.0 * znot)
    fwm = jnp.where(abokb30 <= 100.0,
                    jnp.exp(-8.82 + 7.02 * abokb30 ** (-0.078)),
                    jnp.exp(-7.30 + 5.61 * abokb30 ** (-0.109)))
    ubouwm = jnp.sqrt(2.0 / fwm)
    for _ in range(6):                       # sg_purewave fixed point
        ro_pw = row / ubouwm
        ubouwm = 1.0 / _sg_phi(1.0 / (SG_KAPPA * ro_pw))

    a1 = jnp.full_like(Umag, 1.0e-6)
    b1 = ubouwm
    ua, mu_a, eps_a, ro_a = _sg_stress_ratios(row, phicw, a1)
    fofa = _sg_fofx(zrozn, ubokur, ua, eps_a, ro_a)
    fofb = -fofa
    c1 = 0.5 * (a1 + b1)
    uc, mu_c, eps_c, ro_c = _sg_stress_ratios(row, phicw, c1)
    fofc = _sg_fofx(zrozn, ubokur, uc, eps_c, ro_c)
    for _ in range(SG_N):
        swap = fofb * fofc < 0.0
        a1 = jnp.where(swap, c1, a1)
        b1 = jnp.where(swap, b1, c1)
        c1 = 0.5 * (a1 + b1)
        uc, mu_c, eps_c, ro_c = _sg_stress_ratios(row, phicw, c1)
        fofc = _sg_fofx(zrozn, ubokur, uc, eps_c, ro_c)
    ubouc = uc

    ustarcw = Ub / jnp.maximum(ubouc, _EPS)
    ustarwm = mu_c * ustarcw
    ustarc = jnp.maximum(jnp.sqrt(Tauc0), eps_c * ustarcw)
    Tauc = jnp.where(active, ustarc * ustarc, Tauc0)
    Tauw = jnp.where(active, ustarwm * ustarwm, 0.0)
    tauCWmax = jnp.sqrt((Tauc + Tauw * jnp.cos(phicw)) ** 2
                        + (Tauw * jnp.sin(phicw)) ** 2)

    # ---- stress components at u/v points with the CFL clamp -------------
    anglec_u = u[0] / (0.5 * (Umag + st.im1(Umag)))
    bustr = 0.5 * (Tauc + st.im1(Tauc)) * anglec_u
    anglec_v = v[0] / (0.5 * (Umag + st.jm1(Umag)))
    bvstr = 0.5 * (Tauc + st.jm1(Tauc)) * anglec_v
    lim_u = 0.75 * 0.5 * ((z_w[1] + st.im1(z_w[1])) -
                          (z_w[0] + st.im1(z_w[0]))) / cfg.dt
    bustr = jnp.sign(bustr) * jnp.minimum(jnp.abs(bustr),
                                          jnp.abs(u[0]) * lim_u)
    lim_v = 0.75 * 0.5 * ((z_w[1] + st.jm1(z_w[1])) -
                          (z_w[0] + st.jm1(z_w[0]))) / cfg.dt
    bvstr = jnp.sign(bvstr) * jnp.minimum(jnp.abs(bvstr),
                                          jnp.abs(v[0]) * lim_v)

    return BBLOut(bustr=bustr, bvstr=bvstr, tauCWmax=tauCWmax, Ab=Ab,
                  state=BBLState(rlen=lam, rhgt=eta))


def make_sg_bbl_fn(cfg: ModelConfig, bblc: BBLConfig, grid: Grid,
                   wave_fn):
    """Wrap sg_bbl as a bottom-stress hook (bbl.F SG_BBL dispatch)."""
    def fn(time, bstate, u, v, rho1, z_r, z_w, waves=None):
        if waves is not None:
            # coupled-import wave fields (mct_roms_swan.h exchange)
            Hw, Dw, Pw = (waves["Hwave"], waves["Dwave"],
                          waves["Pwave"])
        else:
            Hw, Dw, Pw = wave_fn(time)
        return sg_bbl(cfg, bblc, grid, bstate, u, v, rho1, z_r, z_w,
                      Hw, Dw, Pw)
    return fn
