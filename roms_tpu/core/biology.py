"""Ecosystem source/sink kernels (column physics, trivially batched).

NPZD (Powell et al. 2006): ROMS/Nonlinear/Biology/npzd_Powell.h —
nitrate / phytoplankton / zooplankton / detritus with self-shading
light, Ivlev grazing, and sinking.  The reference's per-column sequential
updates vectorize directly over the horizontal plane; the
positivity-preserving trick (divide the SOURCE field, multiply the
sink-receiving fields) carries over verbatim.  Sinking uses a
CFL-limited first-order upwind flux (the reference's PPM reconstruction
is an accuracy upgrade scheduled with the positivity-advection
milestone).

Tracers are appended after temperature/salinity: cfg.NT = NAT + 4 with
order (NO3, Phyt, Zoop, SDet) — idbio of npzd_Powell_mod.h.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from .. import constants
from ..config import ModelConfig
from ..grid.grid import Grid

INO3, IPHY, IZOO, IDET = 0, 1, 2, 3     # offsets after the NAT tracers


@dataclass(frozen=True)
class NPZDConfig:
    """npzd_Powell.in defaults."""
    BioIter: int = 1
    PARfrac: float = 0.43
    AttSW: float = 0.067       # 1/m
    AttPhy: float = 0.0095     # 1/(m mmol)
    PhyIS: float = 0.025       # initial slope of P-I curve
    Vm_NO3: float = 1.5        # 1/day
    PhyMRD: float = 0.1        # 1/day
    PhyMRN: float = 0.0
    K_NO3: float = 1.0         # mmol/m3
    Ivlev: float = 0.84
    ZooGR: float = 0.52        # 1/day
    ZooEED: float = 0.0
    ZooEEN: float = 0.3
    ZooMRD: float = 0.145      # 1/day
    ZooMRN: float = 0.0
    DetRR: float = 1.03        # 1/day
    wPhy: float = 0.0          # m/day sinking
    wDet: float = 8.0          # m/day
    MinVal: float = 1.0e-6


def npzd_powell(cfg: ModelConfig, bio: NPZDConfig, grid: Grid, t,
                Hz, z_w, srflx):
    """Advance the 4 biological tracers one dt (biology source/sink only).

    t: full tracer stack (NT, N, Mj, Li); returns the updated stack.
    """
    nb = cfg.NAT
    dtdays = cfg.dt * constants.sec2day / max(bio.BioIter, 1)

    NO3_0 = jnp.maximum(t[nb + INO3], bio.MinVal)
    Phy_0 = jnp.maximum(t[nb + IPHY], bio.MinVal)
    Zoo_0 = jnp.maximum(t[nb + IZOO], bio.MinVal)
    Det_0 = jnp.maximum(t[nb + IDET], bio.MinVal)
    NO3, Phy, Zoo, Det = NO3_0, Phy_0, Zoo_0, Det_0

    PARsur = bio.PARfrac * srflx * cfg.rho0 * constants.Cp

    for _ in range(max(bio.BioIter, 1)):
        # ---- light with self-shading, integrated downward -------------
        Att = (bio.AttSW + bio.AttPhy * Phy) * Hz          # (N,...)
        # cumulative attenuation above layer k (surface = last index)
        atn_above = jnp.cumsum(Att[::-1], axis=0)[::-1] - Att
        ExpAtt = jnp.exp(-Att)
        Itop = PARsur[None] * jnp.exp(-atn_above)
        Light = jnp.where(PARsur[None] > 0.0,
                          Itop * (1.0 - ExpAtt) / Att, 0.0)

        # ---- nutrient uptake (implicit in NO3) -------------------------
        cff1 = dtdays * bio.Vm_NO3 * bio.PhyIS
        cff4 = 1.0 / jnp.sqrt(bio.Vm_NO3 ** 2
                              + bio.PhyIS ** 2 * Light * Light + 1e-30)
        cff = Phy * cff1 * cff4 * Light / (bio.K_NO3 + NO3)
        NO3 = NO3 / (1.0 + cff)
        Phy = Phy + NO3 * cff

        # ---- Ivlev grazing (implicit in Phy) ---------------------------
        cffg = Zoo * dtdays * bio.ZooGR * \
            (1.0 - jnp.exp(-bio.Ivlev * Phy)) / Phy
        Phy = Phy / (1.0 + cffg)
        Zoo = Zoo + Phy * (1.0 - bio.ZooEEN - bio.ZooEED) * cffg
        NO3 = NO3 + Phy * bio.ZooEEN * cffg
        Det = Det + Phy * bio.ZooEED * cffg

        # ---- mortality / remineralization (implicit) -------------------
        c2, c3 = dtdays * bio.PhyMRN, dtdays * bio.PhyMRD
        Phy = Phy / (1.0 + c2 + c3)
        NO3 = NO3 + Phy * c2
        Det = Det + Phy * c3
        c2, c3 = dtdays * bio.ZooMRN, dtdays * bio.ZooMRD
        Zoo = Zoo / (1.0 + c2 + c3)
        NO3 = NO3 + Zoo * c2
        Det = Det + Zoo * c3
        c2 = dtdays * bio.DetRR
        Det = Det / (1.0 + c2)
        NO3 = NO3 + Det * c2

        # ---- sinking (upwind, CFL-limited) -----------------------------
        def sink(q, w_mday):
            if w_mday == 0.0:
                return q
            w = w_mday / 86400.0 * cfg.dt / max(bio.BioIter, 1)
            # downward flux through interior interfaces: from layer above
            flux = jnp.minimum(w, 0.9 * Hz[1:]) * q[1:]    # (N-1,...)
            dq = jnp.concatenate([flux, jnp.zeros_like(q[:1])], axis=0) \
                - jnp.concatenate([jnp.zeros_like(q[:1]), flux], axis=0)
            return q + dq / Hz

        Phy = sink(Phy, bio.wPhy)
        Det = sink(Det, bio.wDet)

    # increment relative to the clamped baseline (biology.F applies
    # t(nnew) += (Bio - Bio_old)*Hz so the clamping itself is not a
    # nutrient source)
    inc = jnp.zeros_like(t)
    inc = inc.at[nb + INO3].set(NO3 - NO3_0)
    inc = inc.at[nb + IPHY].set(Phy - Phy_0)
    inc = inc.at[nb + IZOO].set(Zoo - Zoo_0)
    inc = inc.at[nb + IDET].set(Det - Det_0)
    return inc


def make_npzd_hook(cfg: ModelConfig, bio: NPZDConfig, grid: Grid):
    """Biology hook for Model(bio_fn=...): returns the tracer INCREMENT
    added (Hz-weighted) to the corrector seed before step3d_t, matching
    the reference's call placement (main3d.F:1027)."""
    def hook(t, Hz, z_w, forcing):
        return npzd_powell(cfg, bio, grid, t, Hz, z_w, forcing.srflx)
    return hook


# ===========================================================================
# Fennel et al. (2006) nitrogen-cycle ecosystem model
# (ROMS/Nonlinear/Biology/fennel.h, nitrogen core; optional OXYGEN)
# Tracer order after the NAT tracers: (NO3, NH4, Chlo, Phyt, Zoop,
# LDeN, SDeN[, Oxyg]) — idbio of fennel_mod.h.
# ===========================================================================

IFNO3, IFNH4, IFCHL, IFPHY, IFZOO, IFLDN, IFSDN, IFOXY = range(8)

# oxygen stoichiometry + Garcia & Gordon (1992) saturation and
# Wanninkhof (1992) Schmidt-number constants (fennel.h:346-397)
_ROXNO3 = 8.625          # 138/16
_ROXNH4 = 6.625          # 106/16
_L2MOL = 1000.0 / 22.3916
_OA = (2.00907, 3.22014, 4.05010, 4.94457, -0.256847, 3.88767)
_OB = (-0.00624523, -0.00737614, -0.0103410, -0.00817083)
_OC0 = -0.000000488682
_SC_O2 = (1638.0, 81.83, 1.483, 0.008004, 0.0)   # Wanninkhof 92


def o2_saturation(temp, salt):
    """O2 saturation (mmol/m3), Garcia & Gordon (1992)
    (fennel.h:1124-1135)."""
    TS = jnp.log((298.15 - temp) / (273.15 + temp))
    OA0, OA1, OA2, OA3, OA4, OA5 = _OA
    OB0, OB1, OB2, OB3 = _OB
    AA = OA0 + TS * (OA1 + TS * (OA2 + TS * (OA3 + TS * (
        OA4 + TS * OA5)))) + \
        salt * (OB0 + TS * (OB1 + TS * (OB2 + TS * OB3))) + \
        _OC0 * salt * salt
    return _L2MOL * jnp.exp(AA)


def pco2_water_rz(temp, salt, TIC, TAlk, n_brack: int = 30):
    """Equilibrium surface-water pCO2 (ppmv) — pCO2_water_RZ
    (fennel.h:1581-1911, Zeebe & Wolf-Gladrow 2001): carbonate +
    borate + water alkalinity, [H+] from the fifth-order polynomial
    solved by fixed-count bracket/bisection (pH in [5, 10]) — jit- and
    vmap-friendly (no data-dependent exits).

    temp [C], salt [PSS], TIC [mmol/m3], TAlk [meq/m3]."""
    Tk = temp + 273.15
    centiTk = 0.01 * Tk
    invTk = 1.0 / Tk
    logTk = jnp.log(Tk)
    sqrtS = jnp.sqrt(jnp.maximum(salt, 0.0))
    scl = salt / 1.80655
    alk = TAlk * 1.0e-6
    dic = TIC * 1.0e-6
    # Weiss & Price (1980) non-ideality correction ff = k0*(1 - pH2O)
    ff = jnp.exp(-162.8301 + 218.2968 / centiTk
                 + jnp.log(centiTk) * 90.9241
                 - centiTk * centiTk * 1.47696
                 + salt * (0.025695 - centiTk *
                           (0.025225 - centiTk * 0.0049867)))
    # Millero (1995)/Mehrbach K1,K2; Dickson (1990) Kb; Millero Kw
    K1 = 10.0 ** (62.008 - invTk * 3670.7 - logTk * 9.7944
                  + salt * (0.0118 - salt * 0.000116))
    K2 = 10.0 ** (-4.777 - invTk * 1394.7
                  + salt * (0.0184 - salt * 0.000118))
    Kb = jnp.exp(-invTk * (8966.90 + sqrtS * (2890.53 + sqrtS *
                 (77.942 - sqrtS * (1.728 - sqrtS * 0.0996))))
                 - logTk * (24.4344 + sqrtS * (25.085 + sqrtS
                                               * 0.2474))
                 + Tk * (sqrtS * 0.053105) + 148.0248
                 + sqrtS * (137.1942 + sqrtS * 1.62142))
    Kw = jnp.exp(148.9652 - invTk * 13847.26 - logTk * 23.6521
                 - sqrtS * (5.977 - invTk * 118.67 - logTk * 1.0495)
                 - salt * 0.01615)
    borate = 0.000232 * scl / 10.811

    K12 = K1 * K2
    p5 = -1.0
    p4 = -alk - Kb - K1
    p3 = dic * K1 - alk * (Kb + K1) + Kb * borate + Kw - Kb * K1 - K12
    p2 = dic * (Kb * K1 + 2.0 * K12) - alk * (Kb * K1 + K12) \
        + Kb * borate * K1 + (Kw * Kb + Kw * K1 - Kb * K12)
    p1 = 2.0 * dic * Kb * K12 - alk * Kb * K12 + Kb * borate * K12 \
        + Kw * Kb * K1 + Kw * K12
    p0 = Kw * Kb * K12

    # Evaluate the quintic in the scaled variable Y = X * 1e7 with
    # coefficients prescaled by a common 1e31 so every term is O(1):
    # p_k magnitudes run 1e-37..1e-3 and pairwise products of raw
    # residuals (~1e-47) underflow in float32 — which is what the TPU
    # executes.  Only the SIGN of the residual matters for bisection,
    # so the uniform scale is free.
    q5 = p5 * 1.0e-4
    q4 = p4 * 1.0e3
    q3 = p3 * 1.0e10
    q2 = p2 * 1.0e17
    q1 = p1 * 1.0e24
    q0 = p0 * 1.0e31

    def poly(X):
        Y = X * 1.0e7
        return ((((q5 * Y + q4) * Y + q3) * Y + q2) * Y + q1) * Y + q0

    X_lo = jnp.full_like(Tk, 10.0 ** -10.0)
    X_hi = jnp.full_like(Tk, 10.0 ** -5.0)
    f_hi = poly(X_hi)
    for _ in range(n_brack):
        X_mid = 0.5 * (X_lo + X_hi)
        f_mid = poly(X_mid)
        # sign comparison, not product: the product underflows in f32
        same_side = (f_hi >= 0.0) == (f_mid >= 0.0)
        X_hi = jnp.where(same_side, X_mid, X_hi)
        f_hi = jnp.where(same_side, f_mid, f_hi)
        X_lo = jnp.where(same_side, X_lo, X_mid)
    H = 0.5 * (X_lo + X_hi)
    CO2star = dic * H * H / (H * H + K1 * H + K12)
    return CO2star * 1.0e6 / ff


# Weiss (1974) CO2 solubility + Wanninkhof (1992) Schmidt number
# coefficients (fennel.h:400-412)
_SC_CO2 = (2073.1, 125.62, 3.6276, 0.043219, 0.0)
_CO2_SOL = (-60.2409, 93.4517, 23.3585, 0.023517, -0.023656, 0.0047036)


@dataclass(frozen=True)
class FennelConfig:
    """bio_Fennel.in defaults."""
    BioIter: int = 1
    PARfrac: float = 0.43
    AttSW: float = 0.04
    AttChl: float = 0.02486
    Vp0: float = 1.0
    PhyIS: float = 0.025
    K_NO3: float = 2.0         # inverse half-saturation (1/(mmol/m3))
    K_NH4: float = 2.0
    K_Phy: float = 2.0
    Chl2C_m: float = 0.0535
    ChlMin: float = 0.001
    PhyCN: float = 6.625
    PhyMin: float = 0.001
    PhyMR: float = 0.15
    ZooAE_N: float = 0.75
    ZooBM: float = 0.1
    ZooER: float = 0.1
    ZooGR: float = 0.6
    ZooMin: float = 0.001
    ZooMR: float = 0.025
    NitriR: float = 0.05
    I_thNH4: float = 0.0095
    D_p5NH4: float = 0.1
    CoagR: float = 0.005
    SDeRRN: float = 0.03
    LDeRRN: float = 0.01
    wPhy: float = 0.1          # m/day
    wSDet: float = 0.1
    wLDet: float = 1.0
    MinVal: float = 1.0e-6
    # OXYGEN extension (fennel.h ifdef OXYGEN): adds an O2 tracer with
    # photosynthesis/respiration stoichiometry and air-sea exchange
    oxygen: bool = False
    # CARBON extension (fennel.h ifdef CARBON): adds LDeC, SDeC, TIC,
    # TAlk tracers, carbonate-system pCO2 solve and air-sea CO2 flux.
    carbon: bool = False
    # TALK_NONCONSERV: prognostic alkalinity with NO3-uptake /
    # remineralization source terms; False makes TAlk diagnostic
    # 587.05 + 50.56*S (Brewer et al. 1986, fennel.h:1185-1191)
    talk_nonconserv: bool = True
    ZooCN: float = 6.625       # mol C / mol N (bio_Fennel.in:143)
    SDeRRC: float = 0.03       # 1/day carbon detritus remin
    LDeRRC: float = 0.01
    pCO2air: float = 370.0     # ppmv (bio_Fennel.in:207)


def fennel(cfg: ModelConfig, bio: FennelConfig, grid: Grid, t,
           Hz, z_w, srflx, uwind=None, vwind=None):
    """One dt of Fennel nitrogen-cycle sources/sinks; returns the tracer
    increment stack (zeros in the physical-tracer slots)."""
    nb = cfg.NAT
    eps = 1.0e-20
    dtdays = cfg.dt * constants.sec2day / max(bio.BioIter, 1)
    temp = t[0]
    salt = t[1] if cfg.NT > 1 else jnp.zeros_like(temp)
    # tracer layout after NAT (fennel_mod.h:497-526): 7 nitrogen-cycle
    # slots, then CARBON adds (LDeC, SDeC, TIC, TAlk), then OXYGEN
    nbio = 7 + (4 if bio.carbon else 0) + (1 if bio.oxygen else 0)

    f0 = [jnp.maximum(t[nb + i], bio.MinVal) for i in range(nbio)]
    LDeC = SDeC = TIC = TAlk = Oxy = None
    if bio.carbon and bio.oxygen:
        NO3, NH4, Chl, Phy, Zoo, LDeN, SDeN, LDeC, SDeC, TIC, TAlk, \
            Oxy = f0
    elif bio.carbon:
        NO3, NH4, Chl, Phy, Zoo, LDeN, SDeN, LDeC, SDeC, TIC, TAlk = f0
    elif bio.oxygen:
        NO3, NH4, Chl, Phy, Zoo, LDeN, SDeN, Oxy = f0
    else:
        NO3, NH4, Chl, Phy, Zoo, LDeN, SDeN = f0
    if bio.carbon:
        # clamp TIC to physical range (fennel.h:601-607)
        TIC = jnp.clip(TIC, 400.0, 3000.0)
    PARsur = bio.PARfrac * srflx * cfg.rho0 * constants.Cp

    for _ in range(max(bio.BioIter, 1)):
        # ---- light + production + chlorophyll (fennel.h ITER_LOOP) ----
        Att = (bio.AttSW + bio.AttChl * Chl) * Hz
        atn_above = jnp.cumsum(Att[::-1], axis=0)[::-1] - Att
        ExpAtt = jnp.exp(-Att)
        Itop = PARsur[None] * jnp.exp(-atn_above)
        PAR = Itop * (1.0 - ExpAtt) / Att
        day = PARsur[None] > 0.0

        Chl2C = jnp.minimum(Chl / (Phy * bio.PhyCN * 12.0 + eps),
                            bio.Chl2C_m)
        Vp = bio.Vp0 * 0.59 * (1.066 ** temp)
        fac1 = PAR * bio.PhyIS
        Epp = Vp / jnp.sqrt(Vp * Vp + fac1 * fac1)
        t_PPmax = Epp * fac1
        cff1 = NH4 * bio.K_NH4
        cff2 = NO3 * bio.K_NO3
        inhNH4 = 1.0 / (1.0 + cff1)
        LTOT = cff2 * inhNH4 / (1.0 + cff2) + cff1 / (1.0 + cff1)
        facP = dtdays * t_PPmax
        cff4 = jnp.where(day, facP * bio.K_NO3 * inhNH4 / (1.0 + cff2)
                         * Phy, 0.0)
        cff5 = jnp.where(day, facP * bio.K_NH4 / (1.0 + cff1) * Phy, 0.0)
        NO3 = NO3 / (1.0 + cff4)
        NH4 = NH4 / (1.0 + cff5)
        newP = NO3 * cff4
        regP = NH4 * cff5
        Phy = Phy + newP + regP
        if bio.oxygen:
            # photosynthetic O2 production (fennel.h:795-796)
            Oxy = Oxy + newP * _ROXNO3 + regP * _ROXNH4
        if bio.carbon:
            # TIC uptake during growth; NO3 uptake raises alkalinity,
            # NH4 uptake lowers it (fennel.h CARBON/TALK_NONCONSERV)
            TIC = TIC - bio.PhyCN * (newP + regP)
            if bio.talk_nonconserv:
                TAlk = TAlk + newP - regP
        Chl = Chl + jnp.where(
            day,
            (dtdays * t_PPmax * t_PPmax * LTOT * LTOT * bio.Chl2C_m
             * Chl) / (bio.PhyIS * jnp.maximum(Chl2C, eps) * PAR + eps),
            0.0)

        # light-inhibited nitrification (fennel.h:NitriR block)
        cffi = (PAR - bio.I_thNH4) / \
            (bio.D_p5NH4 + PAR - 2.0 * bio.I_thNH4)
        inhib = jnp.where(day, 1.0 - jnp.maximum(0.0, cffi), 1.0)
        cff3 = dtdays * bio.NitriR * inhib
        NH4 = NH4 / (1.0 + cff3)
        nitri = NH4 * cff3
        NO3 = NO3 + nitri
        if bio.oxygen:
            # nitrification consumes 2 mol O2/mol N (fennel.h:847)
            Oxy = Oxy - 2.0 * nitri
        if bio.carbon and bio.talk_nonconserv:
            # nitrification consumes 2 eq alkalinity/mol N
            # (fennel.h:850,878)
            TAlk = TAlk - 2.0 * nitri

        # ---- grazing + phytoplankton mortality ----
        cff1g = dtdays * bio.ZooGR * Zoo * Phy / \
            (bio.K_Phy + Phy * Phy)
        cff3g = 1.0 / (1.0 + cff1g)
        Phy = cff3g * Phy
        Chl = cff3g * Chl
        assim = cff1g * Phy * bio.ZooAE_N
        egest = Phy * cff1g * (1.0 - bio.ZooAE_N)
        Zoo = Zoo + assim
        SDeN = SDeN + egest
        pmort = dtdays * bio.PhyMR * jnp.maximum(Phy - bio.PhyMin, 0.0)
        Phy = Phy - pmort
        Chl = Chl - dtdays * bio.PhyMR * \
            jnp.maximum(Chl - bio.ChlMin, 0.0)
        SDeN = SDeN + pmort
        if bio.carbon:
            # carbon detritus from egestion/mortality + the C:N excess
            # of assimilated food (fennel.h CARBON block at grazing)
            SDeC = SDeC + bio.PhyCN * (egest + pmort) + \
                (bio.PhyCN - bio.ZooCN) * assim

        # ---- zooplankton excretion / mortality / metabolism ----
        fac1z = dtdays * bio.ZooER * Phy * Phy / (bio.K_Phy + Phy * Phy)
        cff2z = dtdays * bio.ZooMR * Zoo
        cff3z = fac1z * bio.ZooAE_N
        Zoo = Zoo / (1.0 + cff2z + cff3z)
        zmort = cff2z * Zoo
        zexc = cff3z * Zoo
        NH4 = NH4 + zexc
        SDeN = SDeN + zmort
        zmet = dtdays * bio.ZooBM * jnp.maximum(Zoo - bio.ZooMin, 0.0)
        Zoo = Zoo - zmet
        NH4 = NH4 + zmet
        if bio.oxygen:
            # zooplankton metabolism + excretion (fennel.h:968)
            Oxy = Oxy - _ROXNH4 * (zmet + zexc)
        if bio.carbon:
            # (fennel.h CARBON at zooplankton block)
            SDeC = SDeC + bio.ZooCN * zmort
            TIC = TIC + bio.ZooCN * (zmet + zexc)
            if bio.talk_nonconserv:
                TAlk = TAlk + zmet + zexc

        # ---- coagulation to large detritus ----
        cffc = dtdays * bio.CoagR * (SDeN + Phy)
        cff2c = 1.0 / (1.0 + cffc)
        Phy = Phy * cff2c
        Chl = Chl * cff2c
        SDeN = SDeN * cff2c
        LDeN = LDeN + Phy * cffc + SDeN * cffc
        if bio.carbon:
            # coagulated N-detritus carries PhyCN carbon (fennel.h)
            SDeC = SDeC - bio.PhyCN * SDeN * cffc
            LDeC = LDeC + bio.PhyCN * (Phy + SDeN) * cffc

        # ---- remineralization ----
        cffs = dtdays * bio.SDeRRN
        SDeN = SDeN / (1.0 + cffs)
        remS = SDeN * cffs
        NH4 = NH4 + remS
        cffl = dtdays * bio.LDeRRN
        LDeN = LDeN / (1.0 + cffl)
        remL = LDeN * cffl
        NH4 = NH4 + remL
        if bio.oxygen:
            # remineralization respiration (fennel.h:1031)
            Oxy = Oxy - _ROXNH4 * (remS + remL)
        if bio.carbon:
            if bio.talk_nonconserv:
                TAlk = TAlk + remS + remL
            # carbon detritus remineralizes at its own rates into TIC
            cffsc = dtdays * bio.SDeRRC
            SDeC = SDeC / (1.0 + cffsc)
            cfflc = dtdays * bio.LDeRRC
            LDeC = LDeC / (1.0 + cfflc)
            TIC = TIC + SDeC * cffsc + LDeC * cfflc
            if not bio.talk_nonconserv:
                # diagnostic alkalinity (Brewer et al. 1986,
                # fennel.h:1185-1191)
                TAlk = 587.05 + 50.56 * salt

        # ---- sinking (upwind, CFL-limited) ----
        def sink(q, w_mday):
            if w_mday == 0.0:
                return q
            w = w_mday / 86400.0 * cfg.dt / max(bio.BioIter, 1)
            flux = jnp.minimum(w, 0.9 * Hz[1:]) * q[1:]
            dq = jnp.concatenate([flux, jnp.zeros_like(q[:1])], axis=0) \
                - jnp.concatenate([jnp.zeros_like(q[:1]), flux], axis=0)
            return q + dq / Hz

        Phy = sink(Phy, bio.wPhy)
        Chl = sink(Chl, bio.wPhy)
        SDeN = sink(SDeN, bio.wSDet)
        LDeN = sink(LDeN, bio.wLDet)
        if bio.carbon:
            SDeC = sink(SDeC, bio.wSDet)
            LDeC = sink(LDeC, bio.wLDet)

        if bio.oxygen:
            # surface O2 gas exchange, Wanninkhof 92 transfer velocity
            # (fennel.h:1100-1143)
            A, B, Cc, D, E = _SC_O2
            Tsur = temp[-1]
            Sc = A - Tsur * (B - Tsur * (Cc - Tsur * (D - Tsur * E)))
            if uwind is not None:
                u10squ = uwind ** 2 + vwind ** 2
            else:
                u10squ = jnp.zeros_like(Tsur)
            kw = dtdays * 0.31 * 24.0 / 100.0 * u10squ * \
                jnp.sqrt(660.0 / Sc)
            sat = o2_saturation(Tsur, t[1][-1] if cfg.NT > 1
                                else jnp.zeros_like(Tsur))
            flux = kw * (sat - Oxy[-1])
            Oxy = Oxy.at[-1].add(flux / Hz[-1])
            Oxy = jnp.maximum(Oxy, 0.0)

        if bio.carbon:
            # surface CO2 gas exchange (fennel.h:1194-1280): pCO2 from
            # the carbonate solve, Wanninkhof 92 transfer velocity,
            # Weiss 74 solubility, constant-pCO2air branch
            Tsur = temp[-1]
            Ssur = salt[-1]
            pco2 = pco2_water_rz(Tsur, Ssur, TIC[-1], TAlk[-1])
            A, B, Cc, D, E = _SC_CO2
            Sc = A - Tsur * (B - Tsur * (Cc - Tsur * (D - Tsur * E)))
            if uwind is not None:
                u10squ = uwind ** 2 + vwind ** 2
            else:
                u10squ = jnp.zeros_like(Tsur)
            kwc = dtdays * 0.31 * 24.0 / 100.0 * u10squ * \
                jnp.sqrt(660.0 / jnp.maximum(Sc, 1.0))
            A1, A2, A3, B1, B2, B3 = _CO2_SOL
            TempK = 0.01 * (Tsur + 273.15)
            co2_sol = jnp.exp(A1 + A2 / TempK + A3 * jnp.log(TempK)
                              + Ssur * (B1 + TempK * (B2 + B3 * TempK)))
            co2_flux = kwc * co2_sol * (bio.pCO2air - pco2)
            TIC = TIC.at[-1].add(co2_flux / Hz[-1])

    inc = jnp.zeros_like(t)
    fields = (NO3, NH4, Chl, Phy, Zoo, LDeN, SDeN) + \
        ((LDeC, SDeC, TIC, TAlk) if bio.carbon else ()) + \
        ((Oxy,) if bio.oxygen else ())
    for i, (new, old) in enumerate(zip(fields, f0)):
        inc = inc.at[nb + i].set(new - old)
    return inc


def make_fennel_hook(cfg: ModelConfig, bio: FennelConfig, grid: Grid,
                     wind_fn=None):
    """wind_fn(forcing) -> (u10, v10) for the OXYGEN gas exchange; the
    default derives u10^2 from the wind stress (fennel.h:1113-1117)."""
    def hook(t, Hz, z_w, forcing):
        if bio.oxygen or bio.carbon:
            if wind_fn is not None:
                uw, vw = wind_fn(forcing)
            else:
                from ..ops import stencil as st
                tau = jnp.sqrt(
                    (0.5 * (forcing.sustr + st.ip1(forcing.sustr)))
                    ** 2 +
                    (0.5 * (forcing.svstr + st.jp1(forcing.svstr)))
                    ** 2)
                u10 = jnp.sqrt(cfg.rho0 * 550.0 * tau)
                uw, vw = u10, jnp.zeros_like(u10)
            return fennel(cfg, bio, grid, t, Hz, z_w, forcing.srflx,
                          uwind=uw, vwind=vw)
        return fennel(cfg, bio, grid, t, Hz, z_w, forcing.srflx)
    return hook


# ===========================================================================
# NPZD Franks et al. (1986) variant (Biology/npzd_Franks.h): depth-
# exponential light, Michaelis-Menten squared grazing, NO3 recycling.
# Tracer order after NAT: (NO3, Phyt, Zoop, SDet).
# ===========================================================================

@dataclass(frozen=True)
class FranksConfig:
    """npzd_Franks.in defaults."""
    BioIter: int = 1
    K_ext: float = 0.06        # 1/m light extinction
    K_NO3: float = 1.0
    K_Phy: float = 0.4
    Vm_NO3: float = 1.5        # 1/day
    PhyMR: float = 0.1
    ZooGR: float = 0.52
    ZooGA: float = 0.3         # grazing inefficiency -> detritus
    ZooEC: float = 0.3         # excretion efficiency -> NO3
    ZooMR: float = 0.145       # mortality -> NO3
    ZooMD: float = 0.05        # mortality -> detritus
    DetRR: float = 0.1
    wDet: float = 8.0          # m/day
    MinVal: float = 1.0e-6


def npzd_franks(cfg: ModelConfig, bio: FranksConfig, grid: Grid, t,
                Hz, z_r):
    """One dt of Franks NPZD source/sink terms (npzd_Franks.h:250-380);
    returns the tracer increment stack."""
    nb = cfg.NAT
    dtdays = cfg.dt * constants.sec2day / max(bio.BioIter, 1)
    f0 = [jnp.maximum(t[nb + i], bio.MinVal) for i in range(4)]
    NO3, Phy, Zoo, Det = f0

    for _ in range(max(bio.BioIter, 1)):
        # uptake with depth-exponential light (npzd_Franks.h:316-329)
        cff = Phy * dtdays * bio.Vm_NO3 * jnp.exp(bio.K_ext * z_r) / \
            (bio.K_NO3 + NO3)
        NO3 = NO3 / (1.0 + cff)
        Phy = Phy + NO3 * cff

        # grazing + phyto mortality (npzd_Franks.h:332-350)
        cffg = Zoo * Phy * dtdays * bio.ZooGR / \
            (bio.K_Phy * bio.K_Phy + Phy * Phy)
        cffm = dtdays * bio.PhyMR
        Phy = Phy / (1.0 + cffg + cffm)
        Zoo = Zoo + Phy * cffg * (1.0 - bio.ZooGA)
        Det = Det + Phy * (cffm + cffg * (bio.ZooGA - bio.ZooEC))
        NO3 = NO3 + Phy * cffg * bio.ZooEC

        # zooplankton mortality split (npzd_Franks.h:353-366)
        Zoo = Zoo / (1.0 + dtdays * (bio.ZooMR + bio.ZooMD))
        NO3 = NO3 + Zoo * dtdays * bio.ZooMR
        Det = Det + Zoo * dtdays * bio.ZooMD

        # remineralization (npzd_Franks.h:368-378)
        cffr = dtdays * bio.DetRR
        Det = Det / (1.0 + cffr)
        NO3 = NO3 + Det * cffr

        # detritus sinking (upwind, CFL-limited; the reference's PPM
        # reconstruction is shared with fennel and follows later)
        w = bio.wDet / 86400.0 * cfg.dt / max(bio.BioIter, 1)
        flux = jnp.minimum(w, 0.9 * Hz[1:]) * Det[1:]
        dq = jnp.concatenate([flux, jnp.zeros_like(Det[:1])], axis=0) \
            - jnp.concatenate([jnp.zeros_like(Det[:1]), flux], axis=0)
        Det = Det + dq / Hz

    inc = jnp.zeros_like(t)
    for i, (new, old) in enumerate(zip((NO3, Phy, Zoo, Det), f0)):
        inc = inc.at[nb + i].set(new - old)
    return inc


def make_franks_hook(cfg: ModelConfig, bio: FranksConfig, grid: Grid):
    def hook(t, Hz, z_w, forcing):
        z_r = 0.5 * (z_w[1:] + z_w[:-1])
        return npzd_franks(cfg, bio, grid, t, Hz, z_r)
    return hook


# ===========================================================================
# Hypoxia Simple Respiration Model (Biology/hypoxia_srm.h): dissolved
# oxygen only, consumed by a prescribed 3-D respiration rate, restored
# by air-sea exchange.  Tracer slot NAT+0 = O2 (mmol/m3).
# ===========================================================================

def hypoxia_srm(cfg: ModelConfig, grid: Grid, t, Hz, respiration,
                uwind=None, vwind=None):
    """One dt of the simple respiration model (hypoxia_srm.h:326-360 +
    the shared surface O2 flux block).  respiration: (N, Mj, Li) rate
    in mmol O2/m3/day.  Returns the tracer increment stack."""
    nb = cfg.NAT
    dtdays = cfg.dt * constants.sec2day
    Oxy0 = jnp.maximum(t[nb], 0.0)
    Oxy = jnp.maximum(Oxy0 - dtdays * respiration, 0.0)

    # surface exchange (same Wanninkhof 92 / Garcia-Gordon block as
    # fennel.h:1100-1143)
    temp = t[0][-1]
    salt = t[1][-1] if cfg.NT > 1 else jnp.zeros_like(temp)
    A, B, Cc, D, E = _SC_O2
    Sc = A - temp * (B - temp * (Cc - temp * (D - temp * E)))
    u10squ = (uwind ** 2 + vwind ** 2) if uwind is not None else \
        jnp.zeros_like(temp)
    kw = dtdays * 0.31 * 24.0 / 100.0 * u10squ * jnp.sqrt(660.0 / Sc)
    flux = kw * (o2_saturation(temp, salt) - Oxy[-1])
    Oxy = Oxy.at[-1].add(flux / Hz[-1])
    inc = jnp.zeros_like(t)
    return inc.at[nb].set(Oxy - Oxy0)


def make_hypoxia_hook(cfg: ModelConfig, grid: Grid, respiration,
                      u10=0.0):
    def hook(t, Hz, z_w, forcing):
        shp = t[0][-1].shape
        uw = jnp.full(shp, u10)
        return hypoxia_srm(cfg, grid, t, Hz, respiration, uwind=uw,
                           vwind=jnp.zeros(shp))
    return hook


# ===========================================================================
# NEMURO lower-trophic ecosystem (Biology/nemuro.h, Kishi et al. 2007):
# two phytoplankton (small/large) x three zooplankton (small/large/
# predator) nitrogen-silicon model.  Tracer order after NAT:
# (SPhy, LPhy, SZoo, LZoo, PZoo, NO3, NH4, PON, DON, SiOH4, Opal).
# Grazing uses the HOLLING_GRAZING variant (squared Michaelis-Menten);
# the Ivlev forms are alternative reference options.
# ===========================================================================

INM_PS, INM_PL, INM_ZS, INM_ZL, INM_ZP = range(5)
INM_NO3, INM_NH4, INM_PON, INM_DON, INM_SIOH, INM_OPAL = range(5, 11)


@dataclass(frozen=True)
class NemuroConfig:
    """nemuro.in defaults (ROMS/External/nemuro.in)."""
    BioIter: int = 1
    PARfrac: float = 0.43
    AttSW: float = 0.04
    AttPS: float = 0.04
    AttPL: float = 0.04
    AlphaPS: float = 0.01
    AlphaPL: float = 0.01
    BetaPS: float = 4.5e-4
    BetaPL: float = 4.5e-4
    VmaxS: float = 0.4
    VmaxL: float = 0.8
    KNO3S: float = 1.0
    KNO3L: float = 3.0
    KNH4S: float = 0.1
    KNH4L: float = 0.3
    KSiL: float = 6.0
    PusaiS: float = 1.5
    PusaiL: float = 1.5
    KGppS: float = 6.93e-2
    KGppL: float = 6.93e-2
    ResPS0: float = 0.03
    ResPL0: float = 0.03
    KResPS: float = 0.0519
    KResPL: float = 0.0519
    GammaS: float = 0.135
    GammaL: float = 0.135
    MorPS0: float = 58.5e-3
    MorPL0: float = 29.0e-3
    KMorPS: float = 6.93e-2
    KMorPL: float = 6.93e-2
    GRmaxSps: float = 0.40
    GRmaxLps: float = 0.10
    GRmaxLpl: float = 0.40
    GRmaxLzs: float = 0.40
    GRmaxPpl: float = 0.20
    GRmaxPzs: float = 0.20
    GRmaxPzl: float = 0.20
    KGraS: float = 6.93e-2
    KGraL: float = 6.93e-2
    KGraP: float = 6.93e-2
    KPS2ZS: float = 0.16
    KPS2ZL: float = 0.16
    KPL2ZL: float = 0.16
    KZS2ZL: float = 0.16
    KPL2ZP: float = 0.16
    KZS2ZP: float = 0.16
    KZL2ZP: float = 0.16
    PusaiPL: float = 4.605
    PusaiZS: float = 3.010
    MorZS0: float = 58.5e-3
    MorZL0: float = 58.5e-3
    MorZP0: float = 58.5e-3
    KMorZS: float = 0.0693
    KMorZL: float = 0.0693
    KMorZP: float = 0.0693
    AlphaZS: float = 0.70
    AlphaZL: float = 0.70
    AlphaZP: float = 0.70
    BetaZS: float = 0.30
    BetaZL: float = 0.30
    BetaZP: float = 0.30
    Nit0: float = 0.03
    VP2N0: float = 0.10
    VP2D0: float = 0.10
    VD2N0: float = 0.20
    VO2S0: float = 0.10
    KNit: float = 6.93e-2
    KP2D: float = 6.93e-2
    KP2N: float = 6.93e-2
    KD2N: float = 6.93e-2
    KO2S: float = 6.93e-2
    RSiN: float = 2.0
    setVPON: float = 40.0      # m/day
    setVOpal: float = 40.0
    MinVal: float = 1.0e-6


def nemuro(cfg: ModelConfig, bio: NemuroConfig, grid: Grid, t, Hz,
           z_w, srflx):
    """One dt of NEMURO source/sink terms (nemuro.h:330-830); returns
    the tracer increment stack."""
    nb = cfg.NAT
    dtdays = cfg.dt * constants.sec2day / max(bio.BioIter, 1)
    temp = t[0]
    f0 = [jnp.maximum(t[nb + i], bio.MinVal) for i in range(11)]
    PS, PL, ZS, ZL, ZP, NO3, NH4, PON, DON, SiOH, Opal = f0
    PARsur = bio.PARfrac * srflx * cfg.rho0 * constants.Cp

    for _ in range(max(bio.BioIter, 1)):
        # ---- light with photoinhibition (nemuro.h:330-360):
        # half-layer staggered attenuation by both phyto groups
        dz = 0.5 * (z_w[1:] - z_w[:-1])
        kapS = bio.AttSW + bio.AttPS * (PS + PL)
        kapL = bio.AttSW + bio.AttPL * (PS + PL)
        attS_half = jnp.exp(-kapS * dz)
        attL_half = jnp.exp(-kapL * dz)
        # cumulative attenuation from the surface down to mid-level
        cumS = jnp.cumprod((attS_half ** 2)[::-1], axis=0)[::-1]
        cumL = jnp.cumprod((attL_half ** 2)[::-1], axis=0)[::-1]
        IS = PARsur[None] * cumS / attS_half
        IL = PARsur[None] * cumL / attL_half
        day = PARsur[None] > 0.0
        LightS = jnp.where(day, (1.0 - jnp.exp(-bio.AlphaPS * IS))
                           * jnp.exp(-bio.BetaPS * IS), 0.0)
        LightL = jnp.where(day, (1.0 - jnp.exp(-bio.AlphaPL * IL))
                           * jnp.exp(-bio.BetaPL * IL), 0.0)

        # ---- small phyto production/respiration/excretion ------------
        cff1 = dtdays * bio.VmaxS * jnp.exp(bio.KGppS * temp) * \
            LightS * PS
        cff2 = cff1 * jnp.exp(-bio.PusaiS * NH4) / (bio.KNO3S + NO3)
        cff3 = cff1 / (bio.KNH4S + NH4)
        NO3 = NO3 / (1.0 + cff2)
        NH4 = NH4 / (1.0 + cff3)
        GppNPS = NO3 * cff2
        GppAPS = NH4 * cff3
        GppPS = GppNPS + GppAPS
        PS = PS + GppPS
        RnewS = GppNPS / jnp.maximum(bio.MinVal, GppPS)
        cff4 = dtdays * bio.ResPS0 * jnp.exp(bio.KResPS * temp)
        PS = PS / (1.0 + cff4)
        ResPS = PS * cff4
        NO3 = NO3 + ResPS * RnewS
        NH4 = NH4 + ResPS * (1.0 - RnewS)
        ExcPS = GppPS * bio.GammaS
        PS = PS - ExcPS
        DON = DON + ExcPS

        # ---- large phyto with Si limitation (nemuro.h:385-425) -------
        cff1 = dtdays * bio.VmaxL * jnp.exp(bio.KGppL * temp) * \
            LightL * PL
        cff2 = jnp.exp(-bio.PusaiL * NH4) / (bio.KNO3L + NO3)
        cff3 = 1.0 / (bio.KNH4L + NH4)
        c4 = cff2 * NO3
        c5 = cff3 * NH4
        c6 = SiOH / (bio.KSiL + SiOH)
        c7 = c6 / jnp.maximum(bio.MinVal, c4 + c5)
        cff4 = cff1 * cff2 * jnp.minimum(1.0, c7)
        cff5 = cff1 * cff3 * jnp.minimum(1.0, c7)
        NO3 = NO3 / (1.0 + cff4)
        NH4 = NH4 / (1.0 + cff5)
        GppNPL = NO3 * cff4
        GppAPL = NH4 * cff5
        GppPL = GppNPL + GppAPL
        PL = PL + GppPL
        SiOH = SiOH - GppPL * bio.RSiN
        RnewL = GppNPL / jnp.maximum(bio.MinVal, GppPL)
        cff7 = dtdays * bio.ResPL0 * jnp.exp(bio.KResPL * temp)
        PL = PL / (1.0 + cff7)
        ResPL = PL * cff7
        NO3 = NO3 + ResPL * RnewL
        NH4 = NH4 + ResPL * (1.0 - RnewL)
        SiOH = SiOH + ResPL * bio.RSiN
        ExcPL = GppPL * bio.GammaL
        PL = PL - ExcPL
        DON = DON + ExcPL
        SiOH = SiOH + ExcPL * bio.RSiN

        # ---- phyto mortality (nemuro.h:427-443) ----------------------
        cm1 = dtdays * bio.MorPS0 * PS * jnp.exp(bio.KMorPS * temp)
        cm2 = dtdays * bio.MorPL0 * PL * jnp.exp(bio.KMorPL * temp)
        PS = PS / (1.0 + cm1)
        PL = PL / (1.0 + cm2)
        MorPS = PS * cm1
        MorPL = PL * cm2
        PON = PON + MorPS + MorPL
        Opal = Opal + MorPL * bio.RSiN

        # ---- grazing web, Holling MM^2 (nemuro.h:560-700) ------------
        tS = jnp.exp(bio.KGraS * temp)
        tL = jnp.exp(bio.KGraL * temp)
        tP = jnp.exp(bio.KGraP * temp)

        def graze(prey, pred, gmax, K, tfac, extra=1.0):
            cff = dtdays * gmax * tfac * extra * pred * prey / \
                (K + prey * prey)
            prey_new = prey / (1.0 + cff)
            return prey_new, cff * prey_new

        PS, GraPS2ZS = graze(PS, ZS, bio.GRmaxSps, bio.KPS2ZS, tS)
        ZS = ZS + GraPS2ZS
        PS, GraPS2ZL = graze(PS, ZL, bio.GRmaxLps, bio.KPS2ZL, tL)
        ZL = ZL + GraPS2ZL
        PL, GraPL2ZL = graze(PL, ZL, bio.GRmaxLpl, bio.KPL2ZL, tL)
        ZL = ZL + GraPL2ZL
        ZS, GraZS2ZL = graze(ZS, ZL, bio.GRmaxLzs, bio.KZS2ZL, tL)
        ZL = ZL + GraZS2ZL
        inhPL = jnp.exp(-bio.PusaiPL * (ZL + ZS))
        PL, GraPL2ZP = graze(PL, ZP, bio.GRmaxPpl, bio.KPL2ZP, tP,
                             inhPL)
        ZP = ZP + GraPL2ZP
        inhZS = jnp.exp(-bio.PusaiZS * ZL)
        ZS, GraZS2ZP = graze(ZS, ZP, bio.GRmaxPzs, bio.KZS2ZP, tP,
                             inhZS)
        ZP = ZP + GraZS2ZP
        ZL, GraZL2ZP = graze(ZL, ZP, bio.GRmaxPzl, bio.KZL2ZP, tP)
        ZP = ZP + GraZL2ZP

        # egestion + excretion (nemuro.h:700-740)
        EgeZS = (1.0 - bio.AlphaZS) * GraPS2ZS
        EgeZL = (1.0 - bio.AlphaZL) * (GraPS2ZL + GraPL2ZL + GraZS2ZL)
        EgeZP = (1.0 - bio.AlphaZP) * (GraPL2ZP + GraZS2ZP + GraZL2ZP)
        ZS = ZS - EgeZS
        ZL = ZL - EgeZL
        ZP = ZP - EgeZP
        PON = PON + EgeZS + EgeZL + EgeZP
        Opal = Opal + (GraPL2ZL + GraPL2ZP) * bio.RSiN
        ExcZS = (bio.AlphaZS - bio.BetaZS) * GraPS2ZS
        ExcZL = (bio.AlphaZL - bio.BetaZL) * \
            (GraPS2ZL + GraPL2ZL + GraZS2ZL)
        ExcZP = (bio.AlphaZP - bio.BetaZP) * \
            (GraPL2ZP + GraZS2ZP + GraZL2ZP)
        ZS = ZS - ExcZS
        ZL = ZL - ExcZL
        ZP = ZP - ExcZP
        NH4 = NH4 + ExcZS + ExcZL + ExcZP

        # zooplankton mortality (nemuro.h:742-760)
        cz1 = dtdays * bio.MorZS0 * ZS * jnp.exp(bio.KMorZS * temp)
        cz2 = dtdays * bio.MorZL0 * ZL * jnp.exp(bio.KMorZL * temp)
        cz3 = dtdays * bio.MorZP0 * ZP * jnp.exp(bio.KMorZP * temp)
        ZS = ZS / (1.0 + cz1)
        ZL = ZL / (1.0 + cz2)
        ZP = ZP / (1.0 + cz3)
        PON = PON + ZS * cz1 + ZL * cz2 + ZP * cz3

        # remineralization chain (nemuro.h:779-806)
        c1 = dtdays * bio.Nit0 * jnp.exp(bio.KNit * temp)
        NH4 = NH4 / (1.0 + c1)
        NO3 = NO3 + NH4 * c1
        c2 = dtdays * bio.VP2N0 * jnp.exp(bio.KP2N * temp)
        PON = PON / (1.0 + c2)
        NH4 = NH4 + PON * c2
        c3 = dtdays * bio.VP2D0 * jnp.exp(bio.KP2D * temp)
        PON = PON / (1.0 + c3)
        DON = DON + PON * c3
        c4 = dtdays * bio.VD2N0 * jnp.exp(bio.KD2N * temp)
        DON = DON / (1.0 + c4)
        NH4 = NH4 + DON * c4
        c5 = dtdays * bio.VO2S0 * jnp.exp(bio.KO2S * temp)
        Opal = Opal / (1.0 + c5)
        SiOH = SiOH + Opal * c5

        # sinking of PON and Opal (upwind, CFL-limited)
        def sink(q, w_mday):
            w = w_mday / 86400.0 * cfg.dt / max(bio.BioIter, 1)
            flux = jnp.minimum(w, 0.9 * Hz[1:]) * q[1:]
            dq = jnp.concatenate([flux, jnp.zeros_like(q[:1])],
                                 axis=0) - \
                jnp.concatenate([jnp.zeros_like(q[:1]), flux], axis=0)
            return q + dq / Hz

        PON = sink(PON, bio.setVPON)
        Opal = sink(Opal, bio.setVOpal)

    inc = jnp.zeros_like(t)
    for i, (new, old) in enumerate(zip(
            (PS, PL, ZS, ZL, ZP, NO3, NH4, PON, DON, SiOH, Opal), f0)):
        inc = inc.at[nb + i].set(new - old)
    return inc


def make_nemuro_hook(cfg: ModelConfig, bio: NemuroConfig, grid: Grid):
    def hook(t, Hz, z_w, forcing):
        return nemuro(cfg, bio, grid, t, Hz, z_w, forcing.srflx)
    return hook


# ---------------------------------------------------------------------------
# NPZD with iron limitation (ROMS/Nonlinear/Biology/npzd_iron.h)
# ---------------------------------------------------------------------------

IFEDIS, IFEPHY = 4, 5                   # iron tracers after NPZD block


@dataclass(frozen=True)
class IronNPZDConfig(NPZDConfig):
    """npzd_iron.in defaults (IRON_LIMIT branch)."""
    T_Fe: float = 1.0          # iron uptake timescale (day)
    A_Fe: float = 0.6          # empirical Fe:C power
    B_Fe: float = 64.0         # empirical Fe:C coefficient (1/M-C)
    K_FeC: float = 16.9        # Fe:C half-saturation (muM-Fe/M-C)
    FeRR: float = 0.5          # Fe remineralization fraction
    FeMax: float = 2.0         # iron-relaxation value (mmol/m3)
    FeNudgTime: float = 5.0    # iron nudging timescale (day)
    iron_relax: bool = False   # coastal source nudging (IRON_RELAX)


def npzd_iron(cfg: ModelConfig, bio: IronNPZDConfig, grid: Grid, t,
              Hz, z_w, srflx, relax_mask=None):
    """NPZD-Powell with iron limitation (npzd_iron.h:436-610): two
    extra tracers Fdis (dissolved iron) and Fphy (phytoplankton-
    associated iron); growth is reduced by min(Fe-limit, N-limit), iron
    is taken up with growth and relaxed toward the empirical Fe:C
    curve FCratioE = B_Fe * Fdis^A_Fe over T_Fe days."""
    nb = cfg.NAT
    dtdays = cfg.dt * constants.sec2day / max(bio.BioIter, 1)
    FeN2FeC = (16.0 / 106.0) * 1.0e3     # npzd_iron.h:215-216
    FeC2FeN = (106.0 / 16.0) * 1.0e-3

    NO3_0 = jnp.maximum(t[nb + INO3], bio.MinVal)
    Phy_0 = jnp.maximum(t[nb + IPHY], bio.MinVal)
    Zoo_0 = jnp.maximum(t[nb + IZOO], bio.MinVal)
    Det_0 = jnp.maximum(t[nb + IDET], bio.MinVal)
    Fdis_0 = jnp.maximum(t[nb + IFEDIS], bio.MinVal)
    Fphy_0 = jnp.maximum(t[nb + IFEPHY], bio.MinVal)
    NO3, Phy, Zoo, Det = NO3_0, Phy_0, Zoo_0, Det_0
    Fdis, Fphy = Fdis_0, Fphy_0

    PARsur = bio.PARfrac * srflx * cfg.rho0 * constants.Cp

    for _ in range(max(bio.BioIter, 1)):
        if bio.iron_relax and relax_mask is not None:
            # IRON_RELAX coastal source (npzd_iron.h:308-313)
            fc = cfg.dt / (bio.FeNudgTime * 86400.0)
            Fdis = Fdis + fc * relax_mask[None] * (bio.FeMax - Fdis)

        Att = (bio.AttSW + bio.AttPhy * Phy) * Hz
        atn_above = jnp.cumsum(Att[::-1], axis=0)[::-1] - Att
        ExpAtt = jnp.exp(-Att)
        Itop = PARsur[None] * jnp.exp(-atn_above)
        Light = jnp.where(PARsur[None] > 0.0,
                          Itop * (1.0 - ExpAtt) / Att, 0.0)

        # iron-limited uptake (npzd_iron.h:445-467)
        FNratio = Fphy / jnp.maximum(bio.MinVal, Phy)
        FCratio = FNratio * FeN2FeC
        FCratioE = bio.B_Fe * Fdis ** bio.A_Fe
        Flimit = FCratio * FCratio / (FCratio * FCratio
                                      + bio.K_FeC * bio.K_FeC)
        Nlimit = 1.0 / (bio.K_NO3 + NO3)
        FNlim = jnp.minimum(1.0, Flimit / (NO3 * Nlimit))
        cff1 = dtdays * bio.Vm_NO3 * bio.PhyIS
        cff4 = 1.0 / jnp.sqrt(bio.Vm_NO3 ** 2
                              + bio.PhyIS ** 2 * Light * Light + 1e-30)
        cff = Phy * cff1 * cff4 * Light * FNlim * Nlimit
        NO3 = NO3 / (1.0 + cff)
        Phy = Phy + NO3 * cff

        # iron uptake proportional to growth (npzd_iron.h:470-475)
        fac = cff * NO3 * FNratio / jnp.maximum(bio.MinVal, Fdis)
        Fdis = Fdis / (1.0 + fac)
        Fphy = Fphy + Fdis * fac
        # relax toward the empirical Fe:C curve (npzd_iron.h:477-491)
        cff6 = Phy * dtdays * (FCratioE - FCratio) / bio.T_Fe * FeC2FeN
        up = cff6 >= 0.0
        cffp = jnp.abs(cff6) / jnp.maximum(bio.MinVal,
                                           jnp.where(up, Fdis, Fphy))
        Fdis = jnp.where(up, Fdis / (1.0 + cffp),
                         Fdis + Fphy * cffp / (1.0 + cffp))
        Fphy = jnp.where(up, Fphy + Fdis * cffp,
                         Fphy / (1.0 + cffp))

        # grazing; phyto-iron follows grazed phytoplankton with FeRR
        # remineralized to the dissolved pool (npzd_iron.h:505-524)
        cffg = Zoo * dtdays * bio.ZooGR * \
            (1.0 - jnp.exp(-bio.Ivlev * Phy)) / Phy
        Phy = Phy / (1.0 + cffg)
        Zoo = Zoo + Phy * (1.0 - bio.ZooEEN - bio.ZooEED) * cffg
        NO3 = NO3 + Phy * bio.ZooEEN * cffg
        Det = Det + Phy * bio.ZooEED * cffg
        Fphy = Fphy / (1.0 + cffg)
        Fdis = Fdis + Fphy * cffg * bio.FeRR

        # mortalities + remineralization (npzd_iron.h:527-575)
        c2, c3 = dtdays * bio.PhyMRN, dtdays * bio.PhyMRD
        Phy = Phy / (1.0 + c2 + c3)
        NO3 = NO3 + Phy * c2
        Det = Det + Phy * c3
        Fphy = Fphy / (1.0 + c2 + c3)
        Fdis = Fdis + Fphy * (c2 + c3) * bio.FeRR
        c2, c3 = dtdays * bio.ZooMRN, dtdays * bio.ZooMRD
        Zoo = Zoo / (1.0 + c2 + c3)
        NO3 = NO3 + Zoo * c2
        Det = Det + Zoo * c3
        c2 = dtdays * bio.DetRR
        Det = Det / (1.0 + c2)
        NO3 = NO3 + Det * c2

        def sink(q, w_mday):
            if w_mday == 0.0:
                return q
            w = w_mday / 86400.0 * cfg.dt / max(bio.BioIter, 1)
            flux = jnp.minimum(w, 0.9 * Hz[1:]) * q[1:]
            dq = jnp.concatenate([flux, jnp.zeros_like(q[:1])], axis=0) \
                - jnp.concatenate([jnp.zeros_like(q[:1]), flux], axis=0)
            return q + dq / Hz

        Phy = sink(Phy, bio.wPhy)
        Det = sink(Det, bio.wDet)
        Fphy = sink(Fphy, bio.wPhy)

    inc = jnp.zeros_like(t)
    for i, (new, old) in enumerate([(NO3, NO3_0), (Phy, Phy_0),
                                    (Zoo, Zoo_0), (Det, Det_0),
                                    (Fdis, Fdis_0), (Fphy, Fphy_0)]):
        inc = inc.at[nb + i].set(new - old)
    return inc


def make_iron_npzd_hook(cfg: ModelConfig, bio: IronNPZDConfig,
                        grid: Grid, relax_mask=None):
    """bio_fn hook: cfg.NT = NAT + 6 with (NO3, Phyt, Zoop, SDet,
    Fdis, Fphy)."""
    def hook(t, Hz, z_w, forcing):
        return npzd_iron(cfg, bio, grid, t, Hz, z_w, forcing.srflx,
                         relax_mask=relax_mask)
    return hook


# ---------------------------------------------------------------------------
# Red tide (ROMS/Nonlinear/Biology/red_tide.h) — Alexandrium fundyense
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class RedTideConfig:
    """red_tide.in defaults (Stock et al. 2005; He et al. 2008)."""
    Gmax: float = 0.3          # maximum growth rate (1/day)
    G_r: float = 0.3           # light-response threshold (1/day)
    G_eff: float = 1.0e-2      # growth efficiency ((m2/W)/day)
    Kn: float = 1.0            # DIN half-saturation (mmol/m3)
    AttW: float = 0.13         # water light attenuation (1/m)
    AttS: float = 2.0          # sediment attenuation (1/cm)
    E_light: float = 9.65      # light germination threshold (W/m2)
    E_dark: float = 0.48       # dark germination threshold (W/m2)
    g_light: float = 0.0157    # light germination rate (%/day)
    g_dark: float = 0.0048     # dark germination rate (%/day)
    Dg: float = 1.0            # cyst germination layer depth (cm)
    Tmin_growth: float = 5.0   # minimum growth temperature (C)
    Mor_a: float = 0.01        # mortality amplitude (1/day)
    Mor_b: float = 0.0         # mortality offset
    Mor_Q10: float = 2.0       # mortality Q10
    Mor_T0: float = 10.0       # mortality reference T (C)
    wDino: float = -10.0       # upward swimming (m/day, negative=up)
    DIN_Cdepth: float = 5.0    # deep DIN value (mmol/m3)
    MinVal: float = 1.0e-6
    srad_Cdepth: float = 200.0


def red_tide(cfg: ModelConfig, bio: RedTideConfig, grid: Grid, t,
             Hz, z_w, srflx, cyst_ini, din_obs=None):
    """Dinoflagellate population model (red_tide.h): cyst germination
    from the bottom sediment layer regulated by near-bottom light,
    growth limited by min(light, DIN) above a temperature threshold,
    Q10 mortality, upward swimming.  One tracer iDino = t[NAT];
    cyst_ini: (Mj, Li) initial cyst abundance (cysts/cm2); din_obs:
    optional DIN field, else the deep constant DIN_Cdepth is used.
    (The endogenous-clock germination modulation of red_tide.h:295-341
    is collapsed to 1; hook a seasonal factor through cyst_ini.)"""
    nb = cfg.NAT
    dtdays = cfg.dt * constants.sec2day
    Dino0 = jnp.maximum(t[nb], 0.0)
    temp = t[0]

    # light at depth (W/m2), water-only attenuation (red_tide.h:342-366)
    depth_r = z_w[-1][None] - 0.5 * (z_w[:-1] + z_w[1:])
    Rad = srflx[None] * cfg.rho0 * constants.Cp * \
        jnp.exp(-bio.AttW * depth_r)

    # germination flux from the cyst layer into the bottom cell
    E_bot = Rad[0] * jnp.exp(-bio.AttS * bio.Dg * 0.5)
    germ_rate = jnp.where(
        E_bot > bio.E_light, bio.g_light,
        jnp.where(E_bot < bio.E_dark, bio.g_dark,
                  bio.g_dark + (E_bot - bio.E_dark)
                  / (bio.E_light - bio.E_dark)
                  * (bio.g_light - bio.g_dark)))
    germ = germ_rate * bio.Dg * 100.0 * 0.01      # fraction/day
    # cysts/cm2 -> cells/m3 into the bottom layer (red_tide.h:394-400)
    cell_flux = cyst_ini * germ * 1.0e4 * dtdays / jnp.maximum(Hz[0],
                                                               0.01)

    # growth: light- and DIN-limited (red_tide.h:417-467)
    G_fac = jnp.where(temp >= bio.Tmin_growth, 1.0, 0.0)
    cffG = bio.Gmax * G_fac + bio.G_r
    G_light = jnp.maximum(0.0, cffG * jnp.tanh(bio.G_eff * Rad / cffG)
                          - bio.G_r)
    DIN = din_obs if din_obs is not None else bio.DIN_Cdepth
    G_DIN = bio.Gmax * G_fac * DIN / (jnp.maximum(bio.Kn, 0.0) + DIN)
    G = jnp.minimum(G_light, G_DIN)

    # Q10 mortality (red_tide.h:484-486)
    M_rate = bio.Mor_a * bio.Mor_Q10 ** ((temp - bio.Mor_T0) * 0.1) \
        + bio.Mor_b

    Dino = Dino0 * (1.0 + dtdays * (G - M_rate))
    Dino = Dino.at[0].add(cell_flux)
    Dino = jnp.maximum(Dino, 0.0)

    # upward swimming (negative sinking): upwind flux toward surface
    w = abs(bio.wDino) / 86400.0 * cfg.dt
    flux = jnp.minimum(w, 0.9 * Hz[:-1]) * Dino[:-1]     # (N-1,...)
    Dino = Dino - jnp.concatenate([flux, jnp.zeros_like(Dino[:1])],
                                  axis=0) / Hz \
        + jnp.concatenate([jnp.zeros_like(Dino[:1]), flux],
                          axis=0) / Hz

    inc = jnp.zeros_like(t)
    inc = inc.at[nb].set(Dino - Dino0)
    return inc


def make_red_tide_hook(cfg: ModelConfig, bio: RedTideConfig, grid: Grid,
                       cyst_ini, din_obs=None):
    """bio_fn hook: cfg.NT = NAT + 1 with the dinoflagellate tracer."""
    def hook(t, Hz, z_w, forcing):
        return red_tide(cfg, bio, grid, t, Hz, z_w, forcing.srflx,
                        cyst_ini, din_obs=din_obs)
    return hook


# ---------------------------------------------------------------------------
# EcoSim bio-optical ecosystem model (ROMS/Nonlinear/Biology/ecosim.h),
# reduced configuration
# ---------------------------------------------------------------------------
# The reference EcoSim resolves NBands=60 spectral irradiance, Nphy
# pigment-resolved phytoplankton groups with C/N/P/Si/Fe quotas,
# bacterioplankton, colored/uncolored DOM and fecal pools (2576 lines).
# This implementation keeps the defining structure — spectral light
# attenuation with per-group pigment absorption, carbon-based groups
# with dynamic N quota and photoacclimating chlorophyll, bacteria
# consuming DOM, fecal regeneration — at a configurable (reduced)
# band/group count; P/Si/Fe quotas and the full pigment spectra are
# out of scope and documented as such.

@dataclass(frozen=True)
class EcoSimConfig:
    """Reduced EcoSim parameters (ecosim_mod.h defaults where they
    map)."""
    nphy: int = 2
    nbands: int = 6               # spectral bands over 400-700 nm
    # water absorption/scattering per band (m-1), blue->red
    a_water: Tuple[float, ...] = (0.015, 0.04, 0.06, 0.1, 0.25, 0.55)
    b_water: Tuple[float, ...] = (0.005, 0.004, 0.003, 0.003, 0.002,
                                  0.002)
    # per-group chl-specific absorption peak (m2/mg chl) per band
    a_chl: Tuple[float, ...] = (0.035, 0.028, 0.02, 0.012, 0.008,
                                0.016)
    GtALG_max: Tuple[float, ...] = (1.5, 1.0)     # max growth (1/day)
    alfa: Tuple[float, ...] = (0.04, 0.02)        # initial slope
    K_NO3: Tuple[float, ...] = (0.5, 1.0)         # uptake half-sat
    C2N_min: float = 5.0          # Redfield-ish quota bounds (mol)
    C2N_max: float = 12.0
    C2CHL_min: float = 30.0       # g C / g chl
    C2CHL_max: float = 120.0
    ExALG: float = 0.05           # exudation fraction of growth
    grazing: Tuple[float, ...] = (0.1, 0.1)       # 1/day loss rate
    fec_frac: float = 0.3         # grazing to fecal; rest to DOM
    GtBAC_max: float = 2.0        # bacterial max growth (1/day)
    K_DOC: float = 25.0
    BacGE: float = 0.3            # growth efficiency
    RegenR: float = 0.1           # fecal regeneration (1/day)
    wFec: float = 5.0             # fecal sinking (m/day)
    nitrif: float = 0.05          # NH4 -> NO3 (1/day)
    MinVal: float = 1.0e-6


# tracer layout after the NAT tracers:
IES_NO3, IES_NH4, IES_DOC, IES_DON, IES_FEC_C, IES_FEC_N, IES_BAC = \
    range(7)
# then per group g: PhyC, PhyN, Chl at IES_PHY0 + 3*g + (0,1,2)
IES_PHY0 = 7


def ecosim_nt(cfg: ModelConfig, eco: EcoSimConfig) -> int:
    return cfg.NAT + IES_PHY0 + 3 * eco.nphy


def ecosim(cfg: ModelConfig, eco: EcoSimConfig, grid: Grid, t, Hz,
           z_w, srflx):
    """One EcoSim source/sink step; returns the tracer increment."""
    nb = cfg.NAT
    dtdays = cfg.dt * constants.sec2day
    mv = eco.MinVal

    NO3 = jnp.maximum(t[nb + IES_NO3], mv)
    NH4 = jnp.maximum(t[nb + IES_NH4], mv)
    DOC = jnp.maximum(t[nb + IES_DOC], mv)
    DON = jnp.maximum(t[nb + IES_DON], mv)
    FecC = jnp.maximum(t[nb + IES_FEC_C], mv)
    FecN = jnp.maximum(t[nb + IES_FEC_N], mv)
    Bac = jnp.maximum(t[nb + IES_BAC], mv)
    Phy = [jnp.maximum(t[nb + IES_PHY0 + 3 * g], mv)
           for g in range(eco.nphy)]
    PhyN = [jnp.maximum(t[nb + IES_PHY0 + 3 * g + 1], mv)
            for g in range(eco.nphy)]
    Chl = [jnp.maximum(t[nb + IES_PHY0 + 3 * g + 2], mv)
           for g in range(eco.nphy)]
    out = {k: v for k, v in zip(
        ("NO3", "NH4", "DOC", "DON", "FecC", "FecN", "Bac"),
        (NO3, NH4, DOC, DON, FecC, FecN, Bac))}

    # ---- spectral light (ecosim.h:600-760 reduced): per band,
    # attenuation by water + chlorophyll of all groups + CDOM-ish DOC
    Ed0 = jnp.maximum(srflx * cfg.rho0 * constants.Cp, 0.0)  # W/m2
    frac_band = 1.0 / eco.nbands
    par_layers = 0.0
    for ib in range(eco.nbands):
        att = eco.a_water[ib] + eco.b_water[ib] \
            + 0.001 * DOC * jnp.exp(-0.014 * (ib - 0.5))
        for g in range(eco.nphy):
            att = att + eco.a_chl[ib] * Chl[g]
        att_dz = att * Hz
        above = jnp.cumsum(att_dz[::-1], axis=0)[::-1] - att_dz
        Etop = Ed0[None] * frac_band * jnp.exp(-above)
        Eavg = Etop * (1.0 - jnp.exp(-att_dz)) / jnp.maximum(att_dz,
                                                             1e-12)
        par_layers = par_layers + Eavg

    # ---- phytoplankton groups: light x quota limited growth ---------
    tot_uptake_NO3 = 0.0
    tot_uptake_NH4 = 0.0
    for g in range(eco.nphy):
        C2CHL = jnp.clip(Phy[g] * 12.0 / jnp.maximum(Chl[g], mv),
                         eco.C2CHL_min, eco.C2CHL_max)
        Gt_ll = eco.GtALG_max[g] * (1.0 - jnp.exp(
            -eco.alfa[g] * par_layers / jnp.maximum(
                eco.GtALG_max[g], mv)))
        # N-quota limitation (Droop-ish on C:N)
        C2N = jnp.clip(Phy[g] / jnp.maximum(PhyN[g], mv),
                       eco.C2N_min, eco.C2N_max)
        quota_lim = (eco.C2N_max - C2N) / (eco.C2N_max - eco.C2N_min)
        mu = jnp.maximum(Gt_ll * quota_lim, 0.0)          # 1/day
        growth = dtdays * mu * Phy[g]
        exud = eco.ExALG * growth
        out_g = Phy[g] + growth - exud
        # N uptake toward the minimum C:N quota, NH4 preferred
        n_demand = dtdays * eco.GtALG_max[g] * PhyN[g] * \
            (NO3 + NH4) / (eco.K_NO3[g] + NO3 + NH4)
        f_nh4 = NH4 / jnp.maximum(NO3 + NH4, mv)
        up_nh4 = jnp.minimum(n_demand * f_nh4, 0.5 * NH4)
        up_no3 = jnp.minimum(n_demand - up_nh4, 0.5 * NO3)
        PhyN_g = PhyN[g] + up_nh4 + up_no3
        tot_uptake_NO3 = tot_uptake_NO3 + up_no3
        tot_uptake_NH4 = tot_uptake_NH4 + up_nh4
        # photoacclimation: chl relaxes toward balanced C2CHL target
        # (low light -> more chl)
        C2CHL_tgt = jnp.clip(
            eco.C2CHL_max - (eco.C2CHL_max - eco.C2CHL_min)
            * par_layers / (par_layers + 30.0),
            eco.C2CHL_min, eco.C2CHL_max)
        Chl_tgt = out_g * 12.0 / C2CHL_tgt
        Chl_g = Chl[g] + dtdays * mu * (Chl_tgt - Chl[g])
        # grazing closure: to fecal + DOM
        graze = dtdays * eco.grazing[g] * Phy[g]
        grazeN = graze * PhyN_g / jnp.maximum(Phy[g], mv)
        out_g = out_g - graze
        PhyN_g = PhyN_g - grazeN
        Chl_g = Chl_g * (1.0 - dtdays * eco.grazing[g])
        out["FecC"] = out["FecC"] + eco.fec_frac * graze
        out["FecN"] = out["FecN"] + eco.fec_frac * grazeN
        out["DOC"] = out["DOC"] + (1.0 - eco.fec_frac) * graze + exud
        out["DON"] = out["DON"] + (1.0 - eco.fec_frac) * grazeN
        out[f"PhyC{g}"] = jnp.maximum(out_g, 0.0)
        out[f"PhyN{g}"] = jnp.maximum(PhyN_g, 0.0)
        out[f"Chl{g}"] = jnp.maximum(Chl_g, 0.0)

    out["NO3"] = out["NO3"] - tot_uptake_NO3
    out["NH4"] = out["NH4"] - tot_uptake_NH4

    # ---- bacterioplankton: DOC/DON consumption (ecosim.h BAC loops) -
    mu_bac = dtdays * eco.GtBAC_max * DOC / (eco.K_DOC + DOC)
    consumC = jnp.minimum(mu_bac * Bac / eco.BacGE, 0.5 * out["DOC"])
    growthB = eco.BacGE * consumC
    respC = consumC - growthB
    consumN = jnp.minimum(consumC * DON / jnp.maximum(DOC, mv),
                          0.5 * out["DON"])
    out["Bac"] = out["Bac"] + growthB - dtdays * 0.05 * Bac
    out["DOC"] = out["DOC"] - consumC + dtdays * 0.05 * Bac
    out["DON"] = out["DON"] - consumN
    out["NH4"] = out["NH4"] + consumN          # remineralization
    # ---- fecal regeneration + sinking; nitrification ----------------
    regen = dtdays * eco.RegenR
    out["NH4"] = out["NH4"] + regen * out["FecN"]
    out["DOC"] = out["DOC"] + regen * out["FecC"]
    out["FecC"] = out["FecC"] * (1.0 - regen)
    out["FecN"] = out["FecN"] * (1.0 - regen)
    nit = dtdays * eco.nitrif * out["NH4"]
    out["NH4"] = out["NH4"] - nit
    out["NO3"] = out["NO3"] + nit

    def sink(q, w_mday):
        w = w_mday / 86400.0 * cfg.dt
        flux = jnp.minimum(w, 0.9 * Hz[1:]) * q[1:]
        dq = jnp.concatenate([flux, jnp.zeros_like(q[:1])], axis=0) \
            - jnp.concatenate([jnp.zeros_like(q[:1]), flux], axis=0)
        return q + dq / Hz

    out["FecC"] = sink(out["FecC"], eco.wFec)
    out["FecN"] = sink(out["FecN"], eco.wFec)

    inc = jnp.zeros_like(t)
    order = ["NO3", "NH4", "DOC", "DON", "FecC", "FecN", "Bac"]
    olds = [NO3, NH4, DOC, DON, FecC, FecN, Bac]
    for i, (k, old) in enumerate(zip(order, olds)):
        inc = inc.at[nb + i].set(out[k] - old)
    for g in range(eco.nphy):
        inc = inc.at[nb + IES_PHY0 + 3 * g].set(
            out[f"PhyC{g}"] - Phy[g])
        inc = inc.at[nb + IES_PHY0 + 3 * g + 1].set(
            out[f"PhyN{g}"] - PhyN[g])
        inc = inc.at[nb + IES_PHY0 + 3 * g + 2].set(
            out[f"Chl{g}"] - Chl[g])
    return inc


def make_ecosim_hook(cfg: ModelConfig, eco: EcoSimConfig, grid: Grid):
    """bio_fn hook; cfg.NT must equal ecosim_nt(cfg, eco)."""
    def hook(t, Hz, z_w, forcing):
        return ecosim(cfg, eco, grid, t, Hz, z_w, forcing.srflx)
    return hook


# ---------------------------------------------------------------------------
# EcoSim full-census bio-optical model (ecosim_mod.h state,
# ecosim.h process structure)
# ---------------------------------------------------------------------------
# The complete reference state vector (ecosim_mod.h:201-283, default
# census Nphy=4 PHY=(1,2,4,5), Nbac=1, Ndom=2, Nfec=2): 6 nutrients
# (NO3, NH4, PO4, FeO, SiO, DIC), bacteria C/N/P/Fe, two DOM pools of
# CDMC/DOMC/DOMN/DOMP, two fecal pools of C/N/P/Fe/Si, per-group
# phytoplankton C/N/P/Fe (+Si for the diatom groups) and the pigment
# tracers selected by the PIG matrix — 61 biological tracers.
#
# Process structure follows ecosim.h: spectral downwelling irradiance
# attenuated by water, pigment absorption and colored DOM; quantum-
# yield growth limited by the most-limiting internal quota (Droop form
# over N/P/Si/Fe); external uptake toward balanced quotas with
# Michaelis-Menten kinetics (ecosim.in HsNO3/HsNH4/HsPO4/HsSiO/HsFe);
# exudation feeding labile DOM with the cDOCfrac_c colored fraction;
# grazing losses split to the two fecal pools; bacterioplankton at
# fixed C2nBAC/C2pBAC/C2FeBAC stoichiometry consuming labile DOC;
# temperature-based fecal regeneration and the slow WF sinking of the
# large fecal pool; nitrification RtNIT*NH4/(HsNIT+NH4).
# Pigments other than chlorophyll-a follow their group's chl-a with
# fixed pigment ratios (the reference photoacclimates each pigment;
# that refinement is documented as a reduction).

# ecosim_mod.h:238-247 pigment presence matrix, columns = species
# 1-7, rows = pigments 1-7 (chl-a, chl-b, chl-c, PSC, PPC, LPUC, HPUC)
_ECOSIM_PIG = (
    (1, 1, 1, 1, 1, 1, 1),
    (0, 0, 0, 0, 0, 1, 1),
    (1, 1, 1, 1, 0, 0, 0),
    (1, 1, 1, 1, 0, 0, 0),
    (1, 1, 1, 1, 1, 1, 1),
    (0, 0, 0, 0, 0, 0, 0),
    (0, 0, 0, 0, 1, 0, 0),
)


@dataclass(frozen=True)
class EcoSimFullConfig:
    """ecosim.in defaults for the standard 4-group census
    (PHY = small diatom, large diatom, large dinoflagellate,
    synechococcus; ecosim_mod.h:250)."""
    species: Tuple[int, ...] = (1, 2, 4, 5)   # PHY selection
    nbands: int = 12                          # 400-700 nm bands
    # per-group (ecosim.in:68-205)
    GtALG_max: Tuple[float, ...] = (3.7, 3.7, 2.0, 2.0)     # 1/day
    HsNO3: Tuple[float, ...] = (0.824, 0.412, 0.824, 0.167)
    HsNH4: Tuple[float, ...] = (0.414, 0.208, 0.414, 0.083)
    HsSiO: Tuple[float, ...] = (1.824, 1.412, 1.0e30, 1.0e30)
    HsPO4: Tuple[float, ...] = (0.0515, 0.02575, 0.0515, 0.010438)
    HsFe: Tuple[float, ...] = (1.0e30,) * 4
    maxC2n: Tuple[float, ...] = (14.0, 17.75, 17.0, 6.625)
    minC2n: Tuple[float, ...] = (6.625,) * 4
    maxC2p: Tuple[float, ...] = (106.0, 106.0, 130.0, 106.0)
    minC2p: Tuple[float, ...] = (106.0,) * 4
    maxC2Si: Tuple[float, ...] = (5.521, 5.521, 0.0, 0.0)
    minC2Si: Tuple[float, ...] = (5.521, 5.521, 1.0, 1.0)
    maxC2Fe: Tuple[float, ...] = (1.0e30,) * 4
    minC2Fe: Tuple[float, ...] = (1.0e30,) * 4
    qu_yld: Tuple[float, ...] = (0.0833,) * 4  # mol C / mol quanta
    E0_comp: Tuple[float, ...] = (10.0, 10.0, 10.0, 6.0)
    E0_inhib: Tuple[float, ...] = (1.0e4, 1.0e4, 105.0, 1.0e4)
    ExALG: Tuple[float, ...] = (0.005,) * 4   # exudation fraction
    HsGRZ: Tuple[float, ...] = (0.01,) * 4    # grazing loss (1/day)
    C2CHL_min: float = 30.0
    C2CHL_max: float = 120.0
    # bacteria (ecosim.in:389-419)
    GtBAC_max: float = 2.0
    HsDOC_ba: float = 130.0
    BacGE: float = 0.3
    C2nBAC: float = 5.0
    C2pBAC: float = 60.0
    C2FeBAC: float = 1000.0
    BacMort: float = 0.05                     # 1/day to labile DOM
    # DOM (ecosim.in:468)
    cDOCfrac_c: Tuple[float, float] = (0.0323, 0.0930)
    relict_frac: float = 0.1                  # production to pool 2
    aCDOC443: float = 0.02                    # m2/mmol C at 443 nm
    S_cdoc: float = 0.014                     # 1/nm spectral slope
    photobleach: float = 0.02                 # 1/day at surface light
    # fecal pools (ecosim.in:489-494): pool 1 suspended, pool 2 sinks
    WF: Tuple[float, float] = (0.0, 100.0)    # m/day
    RegenR: Tuple[float, float] = (0.1, 0.05)  # 1/day at Tbase
    RegTbase: float = 27.0
    fec_split: Tuple[float, float] = (0.5, 0.5)
    graz_fec: float = 0.3                     # grazing to fecal; rest DOM
    # nitrification (ecosim.in:454-459)
    RtNIT: float = 0.4
    HsNIT: float = 0.1
    MinVal: float = 1.0e-6


def _ecosim_pigments(eco: EcoSimFullConfig):
    """Per-group pigment id lists from the PIG matrix columns."""
    out = []
    for sp in eco.species:
        col = [_ECOSIM_PIG[p][sp - 1] for p in range(7)]
        out.append([p + 1 for p in range(7) if col[p]])
    return out


def ecosim_full_layout(eco: EcoSimFullConfig):
    """Ordered biological tracer names (ecosim_mod.h census)."""
    names = ["NO3", "NH4", "PO4", "FeO", "SiO", "DIC",
             "BacC", "BacN", "BacP", "BacF",
             "CDMC1", "CDMC2", "DOMC1", "DOMC2",
             "DOMN1", "DOMN2", "DOMP1", "DOMP2",
             "FecC1", "FecC2", "FecN1", "FecN2", "FecP1", "FecP2",
             "FecF1", "FecF2", "FecS1", "FecS2"]
    for g, sp in enumerate(eco.species):
        names += [f"PhyC{g+1}", f"PhyN{g+1}", f"PhyP{g+1}",
                  f"PhyF{g+1}"]
        if eco.maxC2Si[g] > 0.0:
            names.append(f"PhyS{g+1}")
    for g, pigs in enumerate(_ecosim_pigments(eco)):
        names += [f"Pig{g+1}_{p}" for p in pigs]
    return names


def ecosim_full_nt(cfg: ModelConfig, eco: EcoSimFullConfig) -> int:
    return cfg.NAT + len(ecosim_full_layout(eco))


def _band_centers(nbands):
    import numpy as _np
    edges = _np.linspace(400.0, 700.0, nbands + 1)
    return 0.5 * (edges[:-1] + edges[1:])


def _aw_spectrum(lam):
    """Pure-water absorption fit over 400-700 nm (Pope & Fry 1997
    shape, the data the reference tabulates in ecosim_inp.F)."""
    import numpy as _np
    return 0.0045 + 0.004 * _np.exp((lam - 500.0) / 60.0) \
        * (lam > 500.0) + 0.0002 * _np.exp(-((lam - 420.0) / 40.0)**2)


def _achl_spectrum(lam):
    """Chl-specific absorption (m2/mg): blue 440 and red 675 peaks."""
    import numpy as _np
    return 0.015 + 0.025 * _np.exp(-((lam - 440.0) / 35.0) ** 2) \
        + 0.012 * _np.exp(-((lam - 675.0) / 12.0) ** 2)


def ecosim_full(cfg: ModelConfig, eco: EcoSimFullConfig, grid: Grid,
                t, Hz, z_w, srflx, temp=None):
    """One full-census EcoSim source/sink step; returns d(tracers)."""
    import numpy as _np
    nb = cfg.NAT
    names = ecosim_full_layout(eco)
    idx = {n: nb + i for i, n in enumerate(names)}
    dtdays = cfg.dt * constants.sec2day
    mv = eco.MinVal
    ngrp = len(eco.species)
    pigs = _ecosim_pigments(eco)

    F = {n: jnp.maximum(t[idx[n]], 0.0) for n in names}
    out = dict(F)
    if temp is None:
        temp = t[0]

    # ---- spectral irradiance (ecosim.h:600-780) ----------------------
    lam = _band_centers(eco.nbands)
    aw = _aw_spectrum(lam)
    achl = _achl_spectrum(lam)
    Ed0 = jnp.maximum(srflx * cfg.rho0 * constants.Cp, 0.0)  # W/m2
    # chl proxy: chl-a pigment tracer of each group (mg/m3)
    Chl = [F[f"Pig{g+1}_1"] for g in range(ngrp)]
    CDOC = F["CDMC1"] + F["CDMC2"]
    par_layers = 0.0
    for ib in range(eco.nbands):
        att = aw[ib] + eco.aCDOC443 * CDOC \
            * float(_np.exp(-eco.S_cdoc * (lam[ib] - 443.0)))
        for g in range(ngrp):
            att = att + achl[ib] * Chl[g]
        att_dz = att * Hz
        above = jnp.cumsum(att_dz[::-1], axis=0)[::-1] - att_dz
        Etop = Ed0[None] / eco.nbands * jnp.exp(-above)
        Eavg = Etop * (1.0 - jnp.exp(-att_dz)) / \
            jnp.maximum(att_dz, 1e-12)
        par_layers = par_layers + Eavg

    # ---- phytoplankton groups ----------------------------------------
    def quota_lim(C, X, cmin, cmax):
        """Droop limitation from the internal C:X ratio, 1 at the
        balanced (min) ratio, 0 at the maximum (ecosim.h C2nALG
        nutrient-limitation block).  Disabled ratios (>=1e30 or 0)
        return 1."""
        if cmax >= 1.0e30 or cmax <= 0.0 or cmax <= cmin:
            return 1.0
        C2X = jnp.clip(C / jnp.maximum(X, mv), cmin, cmax)
        return (cmax - C2X) / (cmax - cmin)

    def uptake(pool, demand):
        up = jnp.minimum(demand, 0.5 * out[pool])
        out[pool] = out[pool] - up
        return up

    for g in range(ngrp):
        gn = g + 1
        C = F[f"PhyC{gn}"]
        N = F[f"PhyN{gn}"]
        P = F[f"PhyP{gn}"]
        Fe = F[f"PhyF{gn}"]
        has_si = f"PhyS{gn}" in idx
        Si = F[f"PhyS{gn}"] if has_si else None

        # light response with photoinhibition (ecosim.h Growth block:
        # qu_yld initial slope, E0_comp compensation, E0_inhib onset)
        E = par_layers
        Gt = eco.GtALG_max[g] * (
            1.0 - jnp.exp(-eco.qu_yld[g]
                          * jnp.maximum(E - eco.E0_comp[g], 0.0)
                          / eco.GtALG_max[g]))
        Gt = Gt * jnp.exp(-jnp.maximum(E - eco.E0_inhib[g], 0.0)
                          / eco.E0_inhib[g])

        lim = jnp.minimum(
            quota_lim(C, N, eco.minC2n[g], eco.maxC2n[g]),
            quota_lim(C, P, eco.minC2p[g], eco.maxC2p[g]))
        lim = jnp.minimum(
            lim, quota_lim(C, Fe, eco.minC2Fe[g], eco.maxC2Fe[g]))
        if has_si:
            lim = jnp.minimum(
                lim, quota_lim(C, Si, eco.minC2Si[g], eco.maxC2Si[g]))
        mu = jnp.maximum(Gt * lim, 0.0)                   # 1/day
        growth = dtdays * mu * C
        exud = eco.ExALG[g] * growth
        newC = C + growth - exud
        out["DIC"] = out["DIC"] - growth

        # external uptake toward the balanced quota (Michaelis-Menten)
        def demand(X, cmin, Hs, pool):
            if Hs[g] >= 1.0e30 or cmin >= 1.0e30 or cmin <= 0.0:
                return 0.0
            want = jnp.maximum(newC / cmin - X, 0.0)
            mm = out[pool] / (Hs[g] + out[pool])
            return jnp.minimum(dtdays * eco.GtALG_max[g] * X * mm
                               + 0.1 * want * mm * dtdays, want)

        dN = demand(N, eco.minC2n[g], eco.HsNO3, "NO3")
        f_nh4 = out["NH4"] / jnp.maximum(out["NO3"] + out["NH4"], mv)
        upNH4 = uptake("NH4", dN * f_nh4)
        upNO3 = uptake("NO3", dN - dN * f_nh4)
        newN = N + upNH4 + upNO3
        newP = P + uptake("PO4", demand(P, eco.minC2p[g], eco.HsPO4,
                                        "PO4"))
        newFe = Fe + uptake("FeO", demand(Fe, eco.minC2Fe[g], eco.HsFe,
                                          "FeO"))
        if has_si:
            newSi = Si + uptake("SiO", demand(Si, eco.minC2Si[g],
                                              eco.HsSiO, "SiO"))

        # grazing closure (HsGRZ loss rate): split to the two fecal
        # pools and DOM (ecosim.h losses block)
        graze = dtdays * eco.HsGRZ[g] * C
        fr = graze / jnp.maximum(C, mv)
        gN, gP, gFe = fr * newN, fr * newP, fr * newFe
        newC = newC - graze
        newN = newN - gN
        newP = newP - gP
        newFe = newFe - gFe
        for ip, split in enumerate(eco.fec_split):
            w = eco.graz_fec * split
            out[f"FecC{ip+1}"] = out[f"FecC{ip+1}"] + w * graze
            out[f"FecN{ip+1}"] = out[f"FecN{ip+1}"] + w * gN
            out[f"FecP{ip+1}"] = out[f"FecP{ip+1}"] + w * gP
            out[f"FecF{ip+1}"] = out[f"FecF{ip+1}"] + w * gFe
        if has_si:
            gSi = fr * newSi
            newSi = newSi - gSi
            for ip, split in enumerate(eco.fec_split):
                out[f"FecS{ip+1}"] = out[f"FecS{ip+1}"] \
                    + eco.graz_fec * split * gSi
            # non-fecal Si dissolves straight back
            out["SiO"] = out["SiO"] + (1.0 - eco.graz_fec) * gSi
            out[f"PhyS{gn}"] = jnp.maximum(newSi, 0.0)
        domC = (1.0 - eco.graz_fec) * graze + exud
        cfrac = eco.cDOCfrac_c[0]
        out["CDMC1"] = out["CDMC1"] + cfrac * (1.0 - eco.relict_frac) \
            * domC
        out["CDMC2"] = out["CDMC2"] + cfrac * eco.relict_frac * domC
        out["DOMC1"] = out["DOMC1"] + (1.0 - cfrac) \
            * (1.0 - eco.relict_frac) * domC
        out["DOMC2"] = out["DOMC2"] + (1.0 - cfrac) \
            * eco.relict_frac * domC
        domN = (1.0 - eco.graz_fec) * gN
        domP = (1.0 - eco.graz_fec) * gP
        out["DOMN1"] = out["DOMN1"] + (1.0 - eco.relict_frac) * domN
        out["DOMN2"] = out["DOMN2"] + eco.relict_frac * domN
        out["DOMP1"] = out["DOMP1"] + (1.0 - eco.relict_frac) * domP
        out["DOMP2"] = out["DOMP2"] + eco.relict_frac * domP
        # grazed iron outside the fecal path dissolves back
        out["FeO"] = out["FeO"] + (1.0 - eco.graz_fec) * gFe

        # pigments follow group chl-a; chl-a photoacclimates toward
        # the balanced C2CHL target (reduced ecosim.h pigment block)
        C2CHL_tgt = jnp.clip(
            eco.C2CHL_max - (eco.C2CHL_max - eco.C2CHL_min)
            * par_layers / (par_layers + 30.0),
            eco.C2CHL_min, eco.C2CHL_max)
        chl = F[f"Pig{gn}_1"]
        chl_tgt = jnp.maximum(newC, 0.0) * 12.0 / C2CHL_tgt
        chl_new = chl + dtdays * (mu + eco.HsGRZ[g]) \
            * (chl_tgt - chl)
        out[f"Pig{gn}_1"] = jnp.maximum(chl_new, 0.0)
        ratio = jnp.where(chl > mv, chl_new / jnp.maximum(chl, mv),
                          1.0)
        for p in pigs[g][1:]:
            out[f"Pig{gn}_{p}"] = jnp.maximum(
                F[f"Pig{gn}_{p}"] * ratio, 0.0)

        out[f"PhyC{gn}"] = jnp.maximum(newC, 0.0)
        out[f"PhyN{gn}"] = jnp.maximum(newN, 0.0)
        out[f"PhyP{gn}"] = jnp.maximum(newP, 0.0)
        out[f"PhyF{gn}"] = jnp.maximum(newFe, 0.0)

    # ---- bacterioplankton (ecosim.h bacteria block): fixed
    # stoichiometry C2nBAC/C2pBAC/C2FeBAC on labile DOM ---------------
    DOC1 = out["DOMC1"] + out["CDMC1"]
    mu_b = dtdays * eco.GtBAC_max * DOC1 / (eco.HsDOC_ba + DOC1)
    consum = jnp.minimum(mu_b * F["BacC"] / eco.BacGE, 0.5 * DOC1)
    growB = eco.BacGE * consum
    resp = consum - growB
    # split consumption between colored and uncolored labile pools
    fC = out["CDMC1"] / jnp.maximum(DOC1, mv)
    out["CDMC1"] = out["CDMC1"] - fC * consum
    out["DOMC1"] = out["DOMC1"] - (1.0 - fC) * consum
    out["DIC"] = out["DIC"] + resp
    dBN = growB / eco.C2nBAC
    dBP = growB / eco.C2pBAC
    dBF = growB / eco.C2FeBAC
    upN = jnp.minimum(dBN, 0.5 * (out["DOMN1"] + out["NH4"]))
    fdon = out["DOMN1"] / jnp.maximum(out["DOMN1"] + out["NH4"], mv)
    out["DOMN1"] = out["DOMN1"] - fdon * upN
    out["NH4"] = out["NH4"] - (1.0 - fdon) * upN
    upP = jnp.minimum(dBP, 0.5 * (out["DOMP1"] + out["PO4"]))
    fdop = out["DOMP1"] / jnp.maximum(out["DOMP1"] + out["PO4"], mv)
    out["DOMP1"] = out["DOMP1"] - fdop * upP
    out["PO4"] = out["PO4"] - (1.0 - fdop) * upP
    upF = jnp.minimum(dBF, 0.5 * out["FeO"])
    out["FeO"] = out["FeO"] - upF
    mort = dtdays * eco.BacMort
    out["BacC"] = out["BacC"] + growB - mort * F["BacC"]
    out["BacN"] = out["BacN"] + upN - mort * F["BacN"]
    out["BacP"] = out["BacP"] + upP - mort * F["BacP"]
    out["BacF"] = out["BacF"] + upF - mort * F["BacF"]
    out["DOMC1"] = out["DOMC1"] + mort * F["BacC"]
    out["DOMN1"] = out["DOMN1"] + mort * F["BacN"]
    out["DOMP1"] = out["DOMP1"] + mort * F["BacP"]
    out["FeO"] = out["FeO"] + mort * F["BacF"]

    # ---- fecal regeneration (temperature response, RegTbase) + the
    # WF sinking of each pool; FecS dissolves to SiO ------------------
    Tfac = jnp.clip(2.0 ** ((temp - eco.RegTbase) / 10.0), 0.1, 2.0)
    for ip in range(2):
        reg = dtdays * eco.RegenR[ip] * Tfac
        out["DIC"] = out["DIC"] + reg * out[f"FecC{ip+1}"]
        out["NH4"] = out["NH4"] + reg * out[f"FecN{ip+1}"]
        out["PO4"] = out["PO4"] + reg * out[f"FecP{ip+1}"]
        out["FeO"] = out["FeO"] + reg * out[f"FecF{ip+1}"]
        out["SiO"] = out["SiO"] + reg * out[f"FecS{ip+1}"]
        for el in "CNPFS":
            k = f"Fec{el}{ip+1}"
            out[k] = out[k] * (1.0 - reg)

    def sink(q, w_mday):
        if w_mday == 0.0:
            return q
        w = w_mday / 86400.0 * cfg.dt
        flux = jnp.minimum(w, 0.9 * Hz[1:]) * q[1:]
        dq = jnp.concatenate([flux, jnp.zeros_like(q[:1])], axis=0) \
            - jnp.concatenate([jnp.zeros_like(q[:1]), flux], axis=0)
        return q + dq / Hz

    for ip in range(2):
        for el in "CNPFS":
            k = f"Fec{el}{ip+1}"
            out[k] = sink(out[k], eco.WF[ip])

    # ---- CDMC photobleaching at depth-attenuated light --------------
    bleach = dtdays * eco.photobleach * par_layers \
        / jnp.maximum(Ed0[None] / 2.0, 1.0)
    bleach = jnp.clip(bleach, 0.0, 0.5)
    for ip in range(2):
        k = f"CDMC{ip+1}"
        loss = bleach * out[k]
        out[k] = out[k] - loss
        out[f"DOMC{ip+1}"] = out[f"DOMC{ip+1}"] + loss

    # ---- nitrification (RtNIT * NH4/(HsNIT+NH4)) --------------------
    nit = dtdays * eco.RtNIT * out["NH4"] / (eco.HsNIT + out["NH4"]) \
        * out["NH4"]
    out["NH4"] = out["NH4"] - nit
    out["NO3"] = out["NO3"] + nit

    inc = jnp.zeros_like(t)
    for n in names:
        inc = inc.at[idx[n]].set(out[n] - t[idx[n]])
    return inc


def make_ecosim_full_hook(cfg: ModelConfig, eco: EcoSimFullConfig,
                          grid: Grid):
    """bio_fn hook; cfg.NT must equal ecosim_full_nt(cfg, eco)."""
    def hook(t, Hz, z_w, forcing):
        return ecosim_full(cfg, eco, grid, t, Hz, z_w, forcing.srflx,
                           temp=t[0])
    return hook
