"""COARE 3.0 bulk air-sea fluxes (Fairall et al. 1996/2003).

Re-implements ROMS/Nonlinear/bulk_flux.F for the open-water path:
saturation humidity, Monin-Obukhov iteration (3 fixed passes, as the
reference's IterMax=3 — a static unrolled loop under jit), Charnock
roughness, stability functions bulk_psiu/psit, latent + sensible +
longwave (Berliand) fluxes, wind stress, and E-P salt flux.

Inputs are the atmospheric state (Uwind, Vwind, Tair [C], Pair [mb],
Hair [fraction or g/kg], rain, cloud, srflx) and the model SST/SSS; the
output Forcing carries kinematic stresses (m2/s2) and tracer fluxes
(Celsius m/s, PSU m/s) as consumed by pre_step3d/set_vbc.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from .. import constants
from ..config import ModelConfig
from ..ops import stencil as st
from .state import Forcing

# mod_scalars.F:460-462, 1496-1500, 4545-4547
STEFBO = 5.67e-8
EMMISS = 0.97
RHOW = 1000.0
BLK_CPA = 1004.67
BLK_CPW = 4000.0
BLK_RGAS = 287.1
BLK_ZABL = 600.0
BLK_BETA = 1.2
BLK_ZW = 10.0
BLK_ZT = 10.0
BLK_ZQ = 10.0

_EPS = 1.0e-20
_PI = math.pi


class AtmState(NamedTuple):
    """Atmospheric forcing fields at RHO points."""
    Uwind: jnp.ndarray     # 10-m wind (m/s)
    Vwind: jnp.ndarray
    Tair: jnp.ndarray      # air temperature (Celsius)
    Pair: jnp.ndarray      # sea-level pressure (mb)
    Hair: jnp.ndarray      # relative humidity (fraction) or g/kg if >=2
    cloud: jnp.ndarray     # cloud fraction
    rain: jnp.ndarray      # kg/m2/s
    srflx: jnp.ndarray     # shortwave (Celsius m/s), incl. albedo




def _arctan(x):
    """arctan via double range reduction + odd Taylor polynomial.

    Mosaic (Pallas TPU) has no atan lowering, so both the XLA and the
    fused-kernel paths share this implementation (identical results on
    either path).  Reduction: atan(x)=sign(x)atan(|x|); |x|>1 ->
    pi/2 - atan(1/|x|); t>tan(pi/8) -> pi/4 + atan((t-1)/(t+1)); the
    residual |u| <= tan(pi/8) Taylor series (8 odd terms) is accurate
    to ~2e-9."""
    sgn = jnp.sign(x)
    t = jnp.abs(x)
    big = t > 1.0
    t = jnp.where(big, 1.0 / jnp.maximum(t, 1.0e-30), t)
    tan_pi8 = 0.4142135623730951
    fold = t > tan_pi8
    u = jnp.where(fold, (t - 1.0) / (t + 1.0), t)
    u2 = u * u
    # odd Taylor series sum u^(2k+1) (-1)^k/(2k+1), k=0..7
    p = -1.0 / 15.0
    for c in (1.0 / 13.0, -1.0 / 11.0, 1.0 / 9.0, -1.0 / 7.0,
              1.0 / 5.0, -1.0 / 3.0, 1.0):
        p = p * u2 + c
    a = u * p
    a = jnp.where(fold, 0.25 * _PI + a, a)
    a = jnp.where(big, 0.5 * _PI - a, a)
    return sgn * a


from ..ops.fastmath import cbrt_pos as _cbrt, pow14 as _pow14


def bulk_psiu(ZoL):
    """Momentum stability function (bulk_flux.F:1465-1528)."""
    x = _pow14(jnp.maximum(1.0 - 15.0 * ZoL, _EPS))
    psik = (2.0 * jnp.log(0.5 * (1.0 + x))
            + jnp.log(0.5 * (1.0 + x * x))
            - 2.0 * _arctan(x) + 0.5 * _PI)
    s3 = math.sqrt(3.0)
    y = _cbrt(jnp.maximum(1.0 - 10.15 * ZoL, _EPS))
    psic = (1.5 * jnp.log((1.0 / 3.0) * (1.0 + y + y * y))
            - s3 * _arctan((1.0 + 2.0 * y) / s3) + _PI / s3)
    Fw = ZoL * ZoL / (1.0 + ZoL * ZoL)
    unstable = (1.0 - Fw) * psik + Fw * psic
    cff = jnp.minimum(50.0, 0.35 * ZoL)
    stable = -((1.0 + ZoL) + 0.6667 * (ZoL - 14.28) / jnp.exp(cff)
               + 8.525)
    return jnp.where(ZoL < 0.0, unstable, stable)


def bulk_psit(ZoL):
    """Scalar stability function (bulk_flux.F:1530-1592)."""
    x = jnp.sqrt(jnp.maximum(1.0 - 15.0 * ZoL, _EPS))
    psik = 2.0 * jnp.log(0.5 * (1.0 + x))
    s3 = math.sqrt(3.0)
    y = _cbrt(jnp.maximum(1.0 - 34.15 * ZoL, _EPS))
    psic = (1.5 * jnp.log((1.0 / 3.0) * (1.0 + y + y * y))
            - s3 * _arctan((1.0 + 2.0 * y) / s3) + _PI / s3)
    Fw = ZoL * ZoL / (1.0 + ZoL * ZoL)
    unstable = (1.0 - Fw) * psik + Fw * psic
    cff = jnp.minimum(50.0, 0.35 * ZoL)
    z15 = 1.0 + 2.0 * ZoL
    stable = -(z15 * jnp.sqrt(jnp.maximum(z15, 0.0))
               + 0.6667 * (ZoL - 14.28) / jnp.exp(cff) + 8.525)
    return jnp.where(ZoL < 0.0, unstable, stable)


def _sat_vapor(TC, Pair):
    """Saturation specific humidity pieces (bulk_flux.F:700-720)."""
    cff = (1.0007 + 3.46e-6 * Pair) * 6.1121 * \
        jnp.exp(17.502 * TC / (240.97 + TC))
    return cff


def bulk_flux_rho(cfg: ModelConfig, atm: AtmState, sst, sss,
                  rho_surf, cool_skin: bool = False,
                  coare35: bool = False):
    """COARE fluxes at rho points — the pure elementwise core, shared
    by the XLA path and the fused Pallas kernel (ops/pallas_bulk.py).
    Returns (Taux, Tauy, stflx_T, stflx_S, lrflx, lhflx, shflx, evap)
    with stresses still at rho points in N/m2."""
    g = constants.g
    vonKar = constants.vonKar
    rho0 = cfg.rho0
    Cp = constants.Cp
    Hscale = rho0 * Cp
    # deck-configured measurement heights shadow the module defaults
    # (read_phypar.F blk_ZW/blk_ZT/blk_ZQ)
    BLK_ZW = cfg.blk_zw
    BLK_ZT = cfg.blk_zt
    BLK_ZQ = cfg.blk_zq

    Wmag = jnp.sqrt(atm.Uwind ** 2 + atm.Vwind ** 2)
    TairC = atm.Tair
    TairK = TairC + 273.16
    TseaC = sst
    TseaK = TseaC + 273.16
    RH = atm.Hair
    SRad = atm.srflx * Hscale

    # --- longwave (Berliand, LONGWAVE branch) ---------------------------
    cff = (0.7859 + 0.03477 * TairC) / (1.0 + 0.00412 * TairC)
    e_sat = 10.0 ** cff
    vap_p = e_sat * jnp.where(RH < 2.0, RH, RH * 0.0 + 0.8)
    cff2 = TairK ** 3
    cff1 = cff2 * TairK
    LRad = -EMMISS * STEFBO * (
        cff1 * (0.39 - 0.05 * jnp.sqrt(vap_p))
        * (1.0 - 0.6823 * atm.cloud * atm.cloud)
        + cff2 * 4.0 * (TseaK - TairK))

    # --- humidities ------------------------------------------------------
    cffa = _sat_vapor(TairC, atm.Pair)
    Qair = 0.62197 * cffa / (atm.Pair - 0.378 * cffa + _EPS)
    cffq = cffa * jnp.where(RH < 2.0, RH, 1.0)
    Q = jnp.where(RH < 2.0,
                  0.62197 * cffq / (atm.Pair - 0.378 * cffq + _EPS),
                  RH / 1000.0)
    cffs = _sat_vapor(TseaC, atm.Pair) * 0.98
    Qsea = 0.62197 * cffs / (atm.Pair - 0.378 * cffs)

    rhoAir = atm.Pair * 100.0 / (BLK_RGAS * TairK * (1.0 + 0.61 * Q))
    VisAir = 1.326e-5 * (1.0 + TairC * (6.542e-3 + TairC *
                                        (8.301e-6 - 4.84e-9 * TairC)))
    Hlv = (2.501 - 0.00237 * TseaC) * 1.0e6

    # --- first guesses (bulk_flux.F:735-800) -----------------------------
    Wgus = jnp.full_like(Wmag, 0.5)
    delW = jnp.sqrt(Wmag ** 2 + Wgus ** 2)
    delQ = Qsea - Q
    delT = TseaC - TairC
    ZoW = jnp.full_like(Wmag, 0.0001)
    u10 = delW * jnp.log(10.0 / ZoW) / jnp.log(BLK_ZW / ZoW)
    Wstar = 0.035 * u10
    Zo10 = 0.011 * Wstar * Wstar / g + 0.11 * VisAir / Wstar
    Cd10 = (vonKar / jnp.log(10.0 / Zo10)) ** 2
    Ch10 = 0.00115
    Ct10 = Ch10 / jnp.sqrt(Cd10)
    ZoT10 = 10.0 / jnp.exp(vonKar / Ct10)
    Cd = (vonKar / jnp.log(BLK_ZW / Zo10)) ** 2
    Ct = vonKar / jnp.log(BLK_ZT / ZoT10)
    CC = vonKar * Ct / Cd
    Ribcu = -BLK_ZW / (BLK_ZABL * 0.004 * BLK_BETA ** 3)
    Ri = -g * BLK_ZW * (delT + 0.61 * TairK * delQ) / \
        (TairK * delW * delW + _EPS)
    Zetu = jnp.where(Ri < 0.0,
                     CC * Ri / (1.0 + Ri / Ribcu),
                     CC * Ri / (1.0 + 3.0 * Ri / CC))
    L10 = BLK_ZW / Zetu
    Wstar = delW * vonKar / (jnp.log(BLK_ZW / Zo10)
                             - bulk_psiu(BLK_ZW / L10))
    Tstar = -delT * vonKar / (jnp.log(BLK_ZT / ZoT10)
                              - bulk_psit(BLK_ZT / L10))
    Qstar = -delQ * vonKar / (jnp.log(BLK_ZQ / ZoT10)
                              - bulk_psit(BLK_ZQ / L10))

    if coare35:
        # COARE 3.5 Charnock (Edson et al 2013; bulk_flux.F:795-797)
        charn = jnp.minimum(0.028, -0.005 + 0.0017 * delW)
    else:
        # Charnock parameter (COARE 3.0 wind dependence)
        charn = jnp.where(
            delW > 18.0, 0.018,
            jnp.where(delW > 10.0,
                      0.011 + 0.125 * (0.018 - 0.011) * (delW - 10.0),
                      0.011))
    # cool-skin state (COOL_SKIN, Fairall et al 1996)
    delTc = jnp.zeros_like(delT)
    delQc = jnp.zeros_like(delQ)
    # slope of saturation vapor wrt temperature and thermal expansion
    Cwet = 0.622 * Hlv * Qsea / (BLK_RGAS * TseaK ** 2)
    Tcff = 2.1e-5 * jnp.maximum(TseaC + 3.2, 0.0) ** 0.79  # alpha(T)
    Scff = 0.026 / (1.0 - 0.026 * sss / 34.0 + _EPS) * 0.0 + 0.026
    rhoSea = rho0 + rho_surf

    # --- Monin-Obukhov iteration (IterMax=3, statically unrolled) --------
    for _ in range(3):
        ZoW = charn * Wstar * Wstar / g + 0.11 * VisAir / (Wstar + _EPS)
        Rr = ZoW * Wstar / VisAir
        ZoQ = jnp.minimum(1.15e-4, 5.5e-5 / Rr ** 0.6)
        ZoT = ZoQ
        ZoL = vonKar * g * BLK_ZW * \
            (Tstar * (1.0 + 0.61 * Q) + 0.61 * TairK * Qstar) / \
            (TairK * Wstar * Wstar * (1.0 + 0.61 * Q) + _EPS)
        L = BLK_ZW / (ZoL + _EPS)
        Wpsi = bulk_psiu(ZoL)
        Tpsi = bulk_psit(BLK_ZT / L)
        Qpsi = bulk_psit(BLK_ZQ / L)
        Wstar = jnp.maximum(_EPS, delW * vonKar /
                            (jnp.log(BLK_ZW / ZoW) - Wpsi))
        Tstar = -(delT - delTc) * vonKar / \
            (jnp.log(BLK_ZT / ZoT) - Tpsi)
        Qstar = -(delQ - delQc) * vonKar / \
            (jnp.log(BLK_ZQ / ZoQ) - Qpsi)
        Bf = -g / TairK * Wstar * (Tstar + 0.61 * TairK * Qstar)
        Wgus = jnp.where(Bf > 0.0,
                         BLK_BETA * _cbrt(jnp.maximum(
                             Bf * BLK_ZABL, _EPS)),
                         0.2)
        delW = jnp.sqrt(Wmag ** 2 + Wgus ** 2)
        if cool_skin:
            # cool-skin correction (bulk_flux.F:894-938, Fairall et
            # al 1996): molecular sublayer cooling delTc at the
            # interface, moisture counterpart delQc
            visw, tcw, Cpw = 1.0e-6, 0.6, BLK_CPW
            Clam = 16.0 * g * Cpw * (rhoSea * visw) ** 3 / \
                (tcw * tcw * rhoAir * rhoAir)
            Hcool = 0.001
            Hsb = -rhoAir * BLK_CPA * Wstar * Tstar
            Hlb = -rhoAir * Hlv * Wstar * Qstar
            Fc = 0.065 + 11.0 * Hcool - \
                (1.0 - jnp.exp(-Hcool * 1250.0)) * 6.6e-5 / Hcool
            Qcool = LRad + Hsb + Hlb - SRad * Fc
            Qbouy = Tcff * Qcool + Scff * Hlb * Cpw / Hlv
            lambd = 6.0 / (1.0 + (Clam * jnp.maximum(Qbouy, 0.0) /
                                  (Wstar + _EPS) ** 4) ** 0.75) ** \
                (1.0 / 3.0)
            Hc = lambd * visw / (jnp.sqrt(rhoAir / rhoSea) *
                                 Wstar + _EPS)
            delTc = jnp.where((Qcool > 0.0) & (Qbouy > 0.0),
                              Qcool * Hc / tcw, 0.0)
            delQc = Cwet * delTc

    # --- fluxes (bulk_flux.F:900-1010) -----------------------------------
    Hs = -BLK_CPA * rhoAir * Wstar * Tstar
    diffw = 2.11e-5 * (TairK / 273.16) ** 1.94
    diffh = 0.02411 * (1.0 + TairC * (3.309e-3 - 1.44e-6 * TairC)) / \
        (rhoAir * BLK_CPA + _EPS)
    cffw = Qair * Hlv / (BLK_RGAS * TairK * TairK)
    wet_bulb = 1.0 / (1.0 + 0.622 * (cffw * Hlv * diffw) /
                      (BLK_CPA * diffh))
    Hsr = jnp.abs(atm.rain) * wet_bulb * BLK_CPW * \
        (delT + delQ * Hlv / BLK_CPA)
    SHeat = Hs + Hsr

    Hl = -Hlv * rhoAir * Wstar * Qstar
    upvel = -1.61 * Wstar * Qstar - \
        (1.0 + 1.61 * Q) * Wstar * Tstar / TairK
    Hlw = rhoAir * Hlv * upvel * Q
    LHeat = Hl + Hlw

    Taur = 0.85 * jnp.abs(atm.rain) * Wmag
    cfft = rhoAir * (Wstar * Wstar + Taur / rhoAir) / (Wmag + _EPS)
    Taux = cfft * atm.Uwind
    Tauy = cfft * atm.Vwind

    oH = 1.0 / Hscale
    lrflx = LRad * oH
    lhflx = -LHeat * oH
    shflx = -SHeat * oH
    stflx_T = atm.srflx + lrflx + lhflx + shflx
    evap = LHeat / (Hlv + _EPS)
    stflx_S = (evap - atm.rain) * sss / RHOW
    return Taux, Tauy, stflx_T, stflx_S, lrflx, lhflx, shflx, evap


def bulk_flux(cfg: ModelConfig, atm: AtmState, sst, sss, rho_surf,
              lrflx_data=None, cool_skin: bool = False,
              coare35: bool = False):
    """Compute surface fluxes.

    sst/sss: surface tracer fields (Mj, Li); rho_surf: surface in-situ
    density anomaly.  Returns (sustr, svstr, stflx_T, stflx_S, lrflx,
    lhflx, shflx, evap) with stresses at U/V points (kinematic m2/s2)
    and fluxes in Celsius m/s, PSU m/s.
    """
    (Taux, Tauy, stflx_T, stflx_S, lrflx, lhflx, shflx,
     evap) = bulk_flux_rho(cfg, atm, sst, sss, rho_surf,
                           cool_skin=cool_skin, coare35=coare35)
    # stresses to staggered points, kinematic (bulk_flux.F tail)
    rho0 = cfg.rho0
    sustr = 0.5 * (Taux + st.im1(Taux)) / rho0
    svstr = 0.5 * (Tauy + st.jm1(Tauy)) / rho0
    return sustr, svstr, stflx_T, stflx_S, lrflx, lhflx, shflx, evap


def make_bulk_forcing(cfg: ModelConfig, atm_fn, cool_skin=False,
                      coare35=False):
    """Wrap an atmospheric-state function into a forcing_fn that needs the
    current surface state: returns fn(time, sst, sss, rho_surf) -> Forcing.
    """
    def forcing(time, sst, sss, rho_surf):
        atm = atm_fn(time)
        from ..ops import pallas_kpp
        if pallas_kpp.use_pallas_kpp(cfg):
            # single fused elementwise kernel (ops/pallas_bulk.py)
            import os as _os
            from ..ops.pallas_bulk import bulk_flux_pallas
            (sustr, svstr, stT, stS) = bulk_flux_pallas(
                cfg, atm, sst, sss, rho_surf, cool_skin=cool_skin,
                coare35=coare35,
                interpret=bool(_os.environ.get(
                    "ROMS_TPU_PALLAS_KPP_INTERPRET")))
        else:
            (sustr, svstr, stT, stS, *_rest) = bulk_flux(
                cfg, atm, sst, sss, rho_surf, cool_skin=cool_skin,
                coare35=coare35)
        zeros = jnp.zeros_like(sustr)
        stflx = jnp.stack([stT, stS] + [zeros] * (cfg.NT - 2))
        btflx = jnp.zeros_like(stflx)
        return Forcing(sustr=sustr, svstr=svstr, stflx=stflx,
                       btflx=btflx, srflx=atm.srflx)

    def components(time, sst, sss, rho_surf):
        """Write-time flux components (wrt_his.F idLrad/idLhea/
        idShea/idEmPf/idrain/idPair/idTair/idUair/idVair surface):
        always the jnp reference path — diagnostics, not the hot
        loop."""
        atm = atm_fn(time)
        (_, _, _, _, lrflx, lhflx, shflx, evap) = bulk_flux(
            cfg, atm, sst, sss, rho_surf, cool_skin=cool_skin,
            coare35=coare35)
        Hscale = cfg.rho0 * constants.Cp
        return {"lwrad": lrflx * Hscale,
                "latent": lhflx * Hscale,
                "sensible": shflx * Hscale,
                "evaporation": evap,
                "rain": atm.rain,
                "EminusP": evap / RHOW - atm.rain / RHOW,
                "Pair": atm.Pair, "Tair": atm.Tair,
                "Uwind": atm.Uwind, "Vwind": atm.Vwind}

    forcing.components = components
    return forcing
