"""Fused barotropic fast-substep Pallas kernel (step2d LF-AM3).

One kernel per fast substep fuses the ENTIRE predictor+corrector pair
of core/step2d.py (step2d_LF_AM3.h:163-3058): flux state, fast-time
averaging, free-surface LF/AM3 update, the full 2D momentum RHS
(pressure gradient + C4 advection + Coriolis + curvilinear metric +
harmonic viscosity), the 2D<-3D forcing conversion, both momentum
updates, and the lateral BCs — all in one VMEM pass.  The jnp path's
~40 whole-array HBM round trips per substep (x ~33 substeps per
baroclinic step) collapse to one read of the carry + one write.

Mechanics: the kernel is tiled over j-blocks of BJ rows; every field
that feeds a stencil arrives as a (center, minus, plus) block triple
stitched into one (3*BJ, Li) extended window.  The predictor is
evaluated over the whole extended window (so the corrector's +-2-row
stencils on the predicted state need no second kernel), the corrector
over the same window, and only the center BJ rows are written out.
Row shifts are sublane concats whose wrap contamination lands only in
the outermost ext rows, 4+ rows away from anything consumed; lane
shifts are pltpu.roll, which wraps exactly like jnp.roll.

Both lateral BCs are applied IN-kernel via global-row masks so the
carry handed to the next substep matches core/step2d.py everywhere,
including the ring rows the next substep's stencils read.  Scope is
gated by `use_pallas_step2d`: EW-periodic x closed N/S walls (the
BENCHMARK / UPWELLING channel class), no wet/dry, no point sources, no
WEC coupling, no open-boundary data, no OBC volume conservation.
Everything else falls back to the jnp engine in core/step2d.py.

Numerics mirror core/step2d.py expression-for-expression; permitted
deviations are FMA contraction and select-vs-add ulps, bounded by the
trajectory test in tests/test_pallas_step2d.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# in-kernel shift/BC helpers
# ---------------------------------------------------------------------------

def _iota_l(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _roll(x, s):
    return pltpu.roll(x, s % x.shape[-1], axis=x.ndim - 1)


def _im1(x):
    return _roll(x, 1)


def _ip1(x):
    return _roll(x, -1)


def _jm1(x):
    return jnp.concatenate([x[-1:], x[:-1]], axis=0)


def _jp1(x):
    return jnp.concatenate([x[1:], x[:1]], axis=0)


def _lap_x(x):
    return _im1(x) - 2.0 * x + _ip1(x)


def _lap_y(x):
    return _jm1(x) - 2.0 * x + _jp1(x)


def _perx(x, Li):
    """st.periodic_x: lane 0 <- Li-2, lane Li-1 <- 1."""
    i = _iota_l(x.shape)
    x = jnp.where(i == 0, _roll(x, -(Li - 2)), x)
    return jnp.where(i == Li - 1, _roll(x, Li - 2), x)


def _rowset(f, grow, row, val):
    """f[row, :] = val[row, :] by global-row mask."""
    return jnp.where(grow == row, val, f)


def _bc_rho(f, grow, Mj, Li):
    """boundary.bc_rho for EW-periodic + closed/gradient N/S."""
    f = _rowset(f, grow, 0, _jp1(f))
    f = _rowset(f, grow, Mj - 1, _jm1(f))
    return _perx(f, Li)


def _bc_u(f, grow, Mj, Li, gamma2):
    """boundary.bc_u: closed N/S tangential walls + periodic x."""
    f = _rowset(f, grow, 0, gamma2 * _jp1(f))
    f = _rowset(f, grow, Mj - 1, gamma2 * _jm1(f))
    return _perx(f, Li)


def _bc_v(f, grow, Mj, Li):
    """boundary.bc_v: closed N/S normal walls + periodic x."""
    zero = jnp.zeros_like(f)
    f = jnp.where((grow == 0) | (grow == 1) | (grow == Mj - 1), zero, f)
    return _perx(f, Li)


# ---------------------------------------------------------------------------
# field registry (order defines the kernel's ref layout)
# ---------------------------------------------------------------------------

_GRID_FIELDS = (
    "h", "pm", "pn", "fomn", "dndx", "dmde", "on_u", "om_v",
    "rmask", "umask", "vmask", "visc2_r", "visc2_p",
    "pmon_r", "pnom_r", "pmon_p", "pnom_p",
    "on_r", "om_r", "on_p", "om_p", "pmask",
)

_DYN_TRIPLES = (
    "zeta", "zeta_prev", "ubar", "ubar_prev", "vbar", "vbar_prev",
    "rzeta_prev", "rubar_prev", "rvbar_prev",
    "rufrc", "rvfrc", "ru0", "rv0", "ru0p2", "rv0p2", "rhoS", "rhoA",
)

_POINTWISE = ("Zt", "DU1", "DV1", "DU2", "DV2")

_OUTPUTS = ("zeta", "ubar", "vbar", "zeta_prev", "ubar_prev",
            "vbar_prev", "rz", "ru", "rv",
            "rufrc", "rvfrc", "Zt", "DU1", "DV1", "DU2", "DV2")


def _on_u(E, C):
    """1/pn_u with ghost col 0 copied (grid/grid.py:137,144)."""
    if not C.get("derive"):
        return E["on_u"]
    pn = E["pn"]
    lane = _iota_l(pn.shape)
    pn_u = jnp.where(lane == 0, pn, 0.5 * (pn + _im1(pn)))
    return 1.0 / pn_u


def _om_v(E, C):
    """1/pm_v with ghost row 0 copied (grid/grid.py:138,145)."""
    if not C.get("derive"):
        return E["om_v"]
    pm = E["pm"]
    pm_v = jnp.where(C["grow"] == 0, pm, 0.5 * (pm + _jm1(pm)))
    return 1.0 / pm_v


def _p_avg(a, grow):
    """grid._avg_p: psi-point average with ghost row/col 0 copied."""
    out = 0.25 * (a + _im1(a) + _jm1(a) + _im1(_jm1(a)))
    out = jnp.where(grow == 0, a, out)
    return jnp.where(_iota_l(a.shape) == 0, a, out)


def _flux_state(E, C, zeta, ubar, vbar):
    """core/step2d._flux_state for the gated config (EW-periodic)."""
    Li = C["Li"]
    Drhs = zeta + E["h"]
    DUon = ubar * (0.5 * (Drhs + _im1(Drhs))) * _on_u(E, C)
    DVom = vbar * (0.5 * (Drhs + _jm1(Drhs))) * _om_v(E, C)
    Drhs = _perx(Drhs, Li)
    DUon = _perx(DUon, Li)
    DVom = _perx(DVom, Li)
    return Drhs, DUon, DVom


def _gzeta(zwrk, rhoS, rhoA, var_rho, sal_scalar, rho0):
    if sal_scalar:
        zwrk = (1.0 - sal_scalar) * zwrk
    if var_rho:
        fac = 1000.0 / rho0
        gzeta = (fac + rhoS) * zwrk
        gzeta2 = gzeta * zwrk
        gzetaSA = zwrk * (rhoS - rhoA)
    else:
        gzeta = zwrk
        gzeta2 = zwrk * zwrk
        gzetaSA = None
    return gzeta, gzeta2, gzetaSA, zwrk


def _rhs2d(E, C, ubar, vbar, Drhs, DUon, DVom, gz, gz2, gzSA, zwrk):
    """core/step2d._rhs2d_momentum, EW-periodic / non-NS-periodic."""
    grow, Mj, Li, g = C["grow"], C["Mj"], C["Li"], C["g"]
    var_rho, uv_adv = C["var_rho"], C["uv_adv"]
    uv_cor, curvgrid, visc_on = C["uv_cor"], C["curvgrid"], C["visc_on"]
    h = E["h"]
    cff1 = 0.5 * g
    third = 1.0 / 3.0
    pg_u = (_im1(h) + h) * (_im1(gz) - gz) + (_im1(gz2) - gz2)
    pg_v = (_jm1(h) + h) * (_jm1(gz) - gz) + (_jm1(gz2) - gz2)
    if var_rho:
        rhoA = E["rhoA"]
        pg_u = pg_u + (_im1(h) - h) * (
            _im1(gzSA) + gzSA
            + third * (_im1(rhoA) - rhoA) * (_im1(zwrk) - zwrk))
        pg_v = pg_v + (_jm1(h) - h) * (
            _jm1(gzSA) + gzSA
            + third * (_jm1(rhoA) - rhoA) * (_jm1(zwrk) - zwrk))
    rhs_u = cff1 * _on_u(E, C) * pg_u
    rhs_v = cff1 * _om_v(E, C) * pg_v

    if uv_adv:
        sixth = 1.0 / 6.0
        gu = _lap_x(ubar)
        Dgu = _lap_x(DUon)
        gu = _perx(gu, Li)
        Dgu = _perx(Dgu, Li)
        UFx = 0.25 * (ubar + _ip1(ubar) - sixth * (gu + _ip1(gu))) * \
            (DUon + _ip1(DUon) - sixth * (Dgu + _ip1(Dgu)))

        gue = _lap_y(ubar)
        gue = _rowset(gue, grow, 0, _jp1(gue))
        gue = _rowset(gue, grow, Mj - 1, _jm1(gue))
        DgDV = _lap_x(DVom)
        DgDV = _perx(DgDV, Li)
        UFe = 0.25 * (ubar + _jm1(ubar) - sixth * (gue + _jm1(gue))) * \
            (DVom + _im1(DVom) - sixth * (DgDV + _im1(DgDV)))

        gv = _lap_x(vbar)
        gv = _perx(gv, Li)
        DgDU = _lap_y(DUon)
        VFx = 0.25 * (vbar + _im1(vbar) - sixth * (gv + _im1(gv))) * \
            (DUon + _jm1(DUon) - sixth * (DgDU + _im1(DgDU)))

        gve = _lap_y(vbar)
        Dgve = _lap_y(DVom)
        gve = _rowset(gve, grow, 1, _jp1(gve))
        gve = _rowset(gve, grow, Mj - 1, _jm1(gve))
        Dgve = _rowset(Dgve, grow, 1, _jp1(Dgve))
        Dgve = _rowset(Dgve, grow, Mj - 1, _jm1(Dgve))
        VFe = 0.25 * (vbar + _jp1(vbar) - sixth * (gve + _jp1(gve))) * \
            (DVom + _jp1(DVom) - sixth * (Dgve + _jp1(Dgve)))

        rhs_u = rhs_u - (UFx - _im1(UFx)) - (_jp1(UFe) - UFe)
        rhs_v = rhs_v - (_ip1(VFx) - VFx) - (VFe - _jm1(VFe))

    if uv_cor:
        cffc = 0.5 * Drhs * E["fomn"]
        UFxc = cffc * (vbar + _jp1(vbar))
        VFec = cffc * (ubar + _ip1(ubar))
        UFxc = _perx(UFxc, Li)
        VFec = _perx(VFec, Li)
        rhs_u = rhs_u + 0.5 * (UFxc + _im1(UFxc))
        rhs_v = rhs_v - 0.5 * (VFec + _jm1(VFec))

    if curvgrid and uv_adv:
        if C.get("derive"):
            # ana_grid.h:762-775 centered differences, edges zeroed
            inv_pn = 1.0 / E["pn"]
            inv_pm = 1.0 / E["pm"]
            lane = _iota_l(inv_pn.shape)
            dndx = jnp.where((lane == 0) | (lane == Li - 1), 0.0,
                             0.5 * (_ip1(inv_pn) - _im1(inv_pn)))
            dmde = jnp.where((grow == 0) | (grow == Mj - 1), 0.0,
                             0.5 * (_jp1(inv_pm) - _jm1(inv_pm)))
        else:
            dndx, dmde = E["dndx"], E["dmde"]
        cff1_ = 0.5 * (vbar + _jp1(vbar))
        cff2_ = 0.5 * (ubar + _ip1(ubar))
        cffm = Drhs * (cff1_ * dndx - cff2_ * dmde)
        UFxm = cffm * cff1_
        VFem = cffm * cff2_
        UFxm = _perx(UFxm, Li)
        VFem = _perx(VFem, Li)
        rhs_u = rhs_u + 0.5 * (UFxm + _im1(UFxm))
        rhs_v = rhs_v - 0.5 * (VFem + _jm1(VFem))

    if visc_on:
        pn, pm = E["pn"], E["pm"]
        if C.get("derive"):
            # metrics.F combinations recomputed in place of 9 resident
            # VMEM blocks (grid/grid.py:126-153)
            lane = _iota_l(pm.shape)
            rmask = E["rmask"]
            pmask = (rmask * _im1(rmask) * _jm1(rmask)
                     * _im1(_jm1(rmask)))
            pmask = jnp.where((grow == 0) | (lane == 0), 1.0, pmask)
            on_r = 1.0 / pn
            om_r = 1.0 / pm
            pmon_r = pm / pn
            pnom_r = pn / pm
            pm_p = _p_avg(pm, grow)
            pn_p = _p_avg(pn, grow)
            om_p = 1.0 / pm_p
            on_p = 1.0 / pn_p
            pmon_p = pm_p / pn_p
            pnom_p = pn_p / pm_p
        else:
            pmask = E["pmask"]
            on_r, om_r = E["on_r"], E["om_r"]
            pmon_r, pnom_r = E["pmon_r"], E["pnom_r"]
            om_p, on_p = E["om_p"], E["on_p"]
            pmon_p, pnom_p = E["pmon_p"], E["pnom_p"]
        Drhs_p = 0.25 * (Drhs + _im1(Drhs) + _jm1(Drhs)
                         + _im1(_jm1(Drhs)))
        upn = pn + _im1(pn)
        vpm = pm + _jm1(pm)
        cff_r = E["visc2_r"] * Drhs * 0.5 * (
            pmon_r * (_ip1(upn * ubar) - (upn * ubar))
            - pnom_r * (_jp1(vpm * vbar) - (vpm * vbar)))
        cff_r = _perx(cff_r, Li)
        UFxv = on_r * on_r * cff_r
        VFev = om_r * om_r * cff_r

        vpn = pn + _jm1(pn)
        upm = pm + _im1(pm)
        cff_p = E["visc2_p"] * Drhs_p * 0.5 * (
            pmon_p * ((vpn * vbar) - _im1(vpn * vbar))
            + pnom_p * ((upm * ubar) - _jm1(upm * ubar))) * pmask
        cff_p = _perx(cff_p, Li)
        UFev = om_p * om_p * cff_p
        VFxv = on_p * on_p * cff_p

        rhs_u = rhs_u + 0.5 * upn * (UFxv - _im1(UFxv)) \
            + 0.5 * upm * (_jp1(UFev) - UFev)
        rhs_v = rhs_v + 0.5 * vpn * (_ip1(VFxv) - VFxv) \
            - 0.5 * vpm * (VFev - _jm1(VFev))

    return rhs_u, rhs_v


def _substep(E, P, scget, C):
    """One fused predictor+corrector substep over the ext window.

    E: dict over _DYN_TRIPLES + _GRID_FIELDS, every field a (3*BJ, Li)
    ext array (dyn entries updated in the returned dict); P: dict over
    _POINTWISE center (BJ, Li) accumulators; scget(i): scalar loader
    for this substep's 7 coefficients (first, cffA1, cffA2p, cffA2c,
    a1, a2, a3) — element-wise SMEM loads, a row slice would need an
    SMEM vector load; C: static consts.  Each substep corrupts <= 6 more rows at each ext-window
    edge (the deepest shift chain is carry -> predictor -> corrector at
    3 rows per stage), so KS substeps per call are valid while
    6*KS <= BJ.
    """
    Mj, Li = C["Mj"], C["Li"]
    grow = C["grow"]
    g, rho0, dtfast = C["g"], C["rho0"], C["dtfast"]
    var_rho, sal_scalar = C["var_rho"], C["sal_scalar"]

    ext_shape = E["zeta"].shape
    first = jnp.full(ext_shape, scget(0)) != 0.0
    # center-rows mask at its own shape: strided-slicing an i1 vector
    # crashes Mosaic's ApplyVectorLayout
    firstc = jnp.full(C["center_shape"], scget(0)) != 0.0
    cffA1, cffA2p, cffA2c = scget(1), scget(2), scget(3)
    a1, a2, a3 = scget(4), scget(5), scget(6)

    zeta, ubar, vbar = E["zeta"], E["ubar"], E["vbar"]
    pmn = E["pm"] * E["pn"]
    pmn4_u = (E["pm"] + _im1(E["pm"])) * (E["pn"] + _im1(E["pn"]))
    pmn4_v = (E["pm"] + _jm1(E["pm"])) * (E["pn"] + _jm1(E["pn"]))

    ctr = C["ctr"]

    # ================= predictor (over the whole ext window) ==========
    Drhs, DUon, DVom = _flux_state(E, C, zeta, ubar, vbar)

    # fast-time averaging, predictor branch (step2d_LF_AM3.h:742-800)
    zero_c = jnp.zeros_like(P["Zt"])
    Pn = {}
    Pn["Zt"] = jnp.where(firstc, zero_c, P["Zt"]) + cffA1 * ctr(zeta)
    Pn["DU1"] = jnp.where(firstc, zero_c, P["DU1"]) + cffA1 * ctr(DUon)
    Pn["DV1"] = jnp.where(firstc, zero_c, P["DV1"]) + cffA1 * ctr(DVom)
    DU2 = jnp.where(firstc, zero_c, P["DU2"]) + cffA2p * ctr(DUon)
    DV2 = jnp.where(firstc, zero_c, P["DV2"]) + cffA2p * ctr(DVom)

    # free surface: FE first step / LF after
    rhs_zeta = (DUon - _ip1(DUon)) + (DVom - _jp1(DVom))
    zeta_fe = zeta + pmn * dtfast * rhs_zeta
    zeta_lf = E["zeta_prev"] + pmn * (2.0 * dtfast) * rhs_zeta
    zeta_p = jnp.where(first, zeta_fe, zeta_lf) * E["rmask"]
    cff4 = 4.0 / 25.0
    cff5 = 1.0 - 2.0 * cff4
    zwrk = jnp.where(first,
                     0.5 * (zeta + zeta_fe),
                     cff5 * zeta + cff4 * (E["zeta_prev"] + zeta_lf))
    gz, gz2, gzSA, zwrk = _gzeta(zwrk, E["rhoS"], E["rhoA"],
                                 var_rho, sal_scalar, rho0)
    zeta_p = _bc_rho(zeta_p, grow, Mj, Li)
    Dnew = zeta_p + E["h"]

    rhs_u, rhs_v = _rhs2d(E, C, ubar, vbar, Drhs, DUon, DVom,
                          gz, gz2, gzSA, zwrk)

    # 2D<-3D coupling conversion on the first fast step
    # (step2d_LF_AM3.h:2190-2425)
    rufrc_c = jnp.where(first, E["rufrc"] - rhs_u, E["rufrc"])
    rvfrc_c = jnp.where(first, E["rvfrc"] - rhs_v, E["rvfrc"])
    if "fu_hist" in E:
        # resident engine: -a2*ru0 + a3*ru0p2 precombined outside the
        # kernel (constant across substeps) to drop 2 VMEM fields
        forcing_u = a1 * rufrc_c + E["fu_hist"]
        forcing_v = a1 * rvfrc_c + E["fv_hist"]
    else:
        forcing_u = a1 * rufrc_c - a2 * E["ru0"] + a3 * E["ru0p2"]
        forcing_v = a1 * rvfrc_c - a2 * E["rv0"] + a3 * E["rv0p2"]
    ru_m = rhs_u + jnp.where(first, forcing_u, rufrc_c)
    rv_m = rhs_v + jnp.where(first, forcing_v, rvfrc_c)

    # momentum predictor update
    Dstp = jnp.where(first, zeta, E["zeta_prev"]) + E["h"]
    cffdt = jnp.where(first, 0.5 * dtfast, dtfast)
    ub_base = jnp.where(first, ubar, E["ubar_prev"])
    vb_base = jnp.where(first, vbar, E["vbar_prev"])
    Du_stp = Dstp + _im1(Dstp)
    Dv_stp = Dstp + _jm1(Dstp)
    Du_new = Dnew + _im1(Dnew)
    Dv_new = Dnew + _jm1(Dnew)
    ubar_p = (ub_base * Du_stp + pmn4_u * cffdt * ru_m) / Du_new
    vbar_p = (vb_base * Dv_stp + pmn4_v * cffdt * rv_m) / Dv_new
    ubar_p = ubar_p * E["umask"]
    vbar_p = vbar_p * E["vmask"]
    ubar_p = _bc_u(ubar_p, grow, Mj, Li, C["gamma2"])
    vbar_p = _bc_v(vbar_p, grow, Mj, Li)

    # ================= corrector ======================================
    Drhs2, DUon2, DVom2 = _flux_state(E, C, zeta_p, ubar_p, vbar_p)
    Pn["DU2"] = DU2 + cffA2c * ctr(DUon2)
    Pn["DV2"] = DV2 + cffA2c * ctr(DVom2)

    div = (DUon2 - _ip1(DUon2)) + (DVom2 - _jp1(DVom2))
    zeta_be = zeta + pmn * dtfast * div
    zeta_am3 = zeta + pmn * ((5.0 / 12.0) * dtfast * div
                             + (8.0 / 12.0) * dtfast * rhs_zeta
                             - (1.0 / 12.0) * dtfast * E["rzeta_prev"])
    zeta_c = jnp.where(first, zeta_be, zeta_am3) * E["rmask"]
    cff4c = 2.0 / 5.0
    cff5c = 1.0 - cff4c
    zwrk2 = jnp.where(first,
                      0.5 * (zeta + zeta_be),
                      cff5c * zeta_am3 + cff4c * zeta_p)
    gzc, gz2c, gzSAc, zwrk2 = _gzeta(zwrk2, E["rhoS"], E["rhoA"],
                                     var_rho, sal_scalar, rho0)
    zeta_c = _bc_rho(zeta_c, grow, Mj, Li)
    Dnew2 = zeta_c + E["h"]

    rhs_u2, rhs_v2 = _rhs2d(E, C, ubar_p, vbar_p, Drhs2, DUon2, DVom2,
                            gzc, gz2c, gzSAc, zwrk2)
    rhs_u2 = rhs_u2 + rufrc_c
    rhs_v2 = rhs_v2 + rvfrc_c

    # momentum corrector: BE first / AM3 after (:2528-2642)
    Dstp2 = zeta + E["h"]
    Du_stp2 = Dstp2 + _im1(Dstp2)
    Dv_stp2 = Dstp2 + _jm1(Dstp2)
    Du_new2 = Dnew2 + _im1(Dnew2)
    Dv_new2 = Dnew2 + _jm1(Dnew2)
    half = 0.5 * dtfast
    rhs_u_t = jnp.where(first, half * rhs_u2,
                        half * ((5.0 / 12.0) * rhs_u2
                                + (8.0 / 12.0) * ru_m
                                - (1.0 / 12.0) * E["rubar_prev"]))
    rhs_v_t = jnp.where(first, half * rhs_v2,
                        half * ((5.0 / 12.0) * rhs_v2
                                + (8.0 / 12.0) * rv_m
                                - (1.0 / 12.0) * E["rvbar_prev"]))
    ubar_c = (ubar * Du_stp2 + pmn4_u * rhs_u_t) / Du_new2
    vbar_c = (vbar * Dv_stp2 + pmn4_v * rhs_v_t) / Dv_new2
    ubar_c = ubar_c * E["umask"]
    vbar_c = vbar_c * E["vmask"]
    ubar_c = _bc_u(ubar_c, grow, Mj, Li, C["gamma2"])
    vbar_c = _bc_v(vbar_c, grow, Mj, Li)

    En = dict(E)
    En.update(zeta=zeta_c, zeta_prev=zeta, ubar=ubar_c, ubar_prev=ubar,
              vbar=vbar_c, vbar_prev=vbar, rzeta_prev=rhs_zeta,
              rubar_prev=ru_m, rvbar_prev=rv_m,
              rufrc=rufrc_c, rvfrc=rvfrc_c)
    return En, Pn


def _kernel(Li, Mj, BJ, KS, g, rho0, dtfast, gamma2, sal_scalar,
            var_rho, uv_adv, uv_cor, curvgrid, visc_on, *refs):
    E = {}
    k = 0
    for name in _DYN_TRIPLES + _GRID_FIELDS:
        c, m, p = refs[k][...], refs[k + 1][...], refs[k + 2][...]
        E[name] = jnp.concatenate([m, c, p], axis=0)
        k += 3
    P = {}
    for name in _POINTWISE:
        P[name] = refs[k][...]
        k += 1
    sc = refs[k]                      # (KS, 7) SMEM scalar table
    O = dict(zip(_OUTPUTS, refs[k + 1:]))

    ext_shape = E["zeta"].shape
    grow = (jax.lax.broadcasted_iota(jnp.int32, ext_shape, 0)
            + pl.program_id(0) * BJ - BJ)
    C = dict(Mj=Mj, Li=Li, grow=grow, g=g, rho0=rho0,
             dtfast=dtfast, gamma2=gamma2, sal_scalar=sal_scalar,
             var_rho=var_rho, uv_adv=uv_adv, uv_cor=uv_cor,
             curvgrid=curvgrid, visc_on=visc_on,
             center_shape=(BJ,) + ext_shape[1:],
             ctr=lambda x: jax.lax.slice_in_dim(x, BJ, 2 * BJ, axis=0))

    for ks in range(KS):
        E, P = _substep(E, P,
                        (lambda row: lambda j: sc[row, j])(ks), C)

    def ctr(x):
        return jax.lax.slice_in_dim(x, BJ, 2 * BJ, axis=0)

    O["zeta"][...] = ctr(E["zeta"])
    O["ubar"][...] = ctr(E["ubar"])
    O["vbar"][...] = ctr(E["vbar"])
    O["zeta_prev"][...] = ctr(E["zeta_prev"])
    O["ubar_prev"][...] = ctr(E["ubar_prev"])
    O["vbar_prev"][...] = ctr(E["vbar_prev"])
    O["rz"][...] = ctr(E["rzeta_prev"])
    O["ru"][...] = ctr(E["rubar_prev"])
    O["rv"][...] = ctr(E["rvbar_prev"])
    O["rufrc"][...] = ctr(E["rufrc"])
    O["rvfrc"][...] = ctr(E["rvfrc"])
    for name in _POINTWISE:
        O[name][...] = P[name]


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

def _substep_call(cfg, grid, dyn, pointwise, scalars, var_rho,
                  interpret, BJ=8, KS=1):
    """KS fused predictor+corrector substeps in ONE kernel call.
    dyn: dict over _DYN_TRIPLES; pointwise: dict over _POINTWISE;
    scalars: (KS, 7) per-substep coefficient table.  Each substep
    corrupts <= 6 rows per ext-window edge, so callers must keep
    6*KS <= BJ (KS=1/BJ=8 and KS=2/BJ=16 are the validated pairs —
    doubling BJ with KS halves both the kernel-launch count and the
    per-substep HBM traffic of the 39 field triples)."""
    Mj, Li = dyn["zeta"].shape
    dtype = dyn["zeta"].dtype
    assert 6 * KS <= BJ, (KS, BJ)
    gj = pl.cdiv(Mj, BJ)

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
    gridf = {name: getattr(grid, name).astype(dtype)
             for name in _GRID_FIELDS}
    for name in _DYN_TRIPLES:
        f = dyn[name]
        args += [f, f, f]
        specs += [s2(0), s2(-1), s2(1)]
    for name in _GRID_FIELDS:
        f = gridf[name]
        args += [f, f, f]
        specs += [s2(0), s2(-1), s2(1)]
    for name in _POINTWISE:
        args.append(pointwise[name])
        specs.append(s2(0))
    args.append(scalars.astype(dtype))
    specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    outs = pl.pallas_call(
        functools.partial(
            _kernel, Li, Mj, BJ, KS,
            float(cfg.g), float(cfg.rho0),
            float(cfg.dt / cfg.ndtfast), float(cfg.gamma2),
            float(cfg.sal_scalar or 0.0),
            bool(var_rho), bool(cfg.uv_adv), bool(cfg.uv_cor),
            bool(cfg.curvgrid and cfg.uv_adv),
            bool(cfg.mixing.visc2 > 0.0)),
        out_shape=tuple(jax.ShapeDtypeStruct((Mj, Li), dtype)
                        for _ in _OUTPUTS),
        grid=(gj,),
        in_specs=specs,
        out_specs=tuple(s2(0) for _ in _OUTPUTS),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    return dict(zip(_OUTPUTS, outs))


def fast_loop_pallas(cfg, grid, nfast, w1j, w2j, var_rho,
                     zeta0, ubar0, vbar0, rufrc, rvfrc, rhoS, rhoA,
                     ru0_prev, rv0_prev, ru0_prev2, rv0_prev2, iic):
    """Pallas engine for core/step2d.make_fast_loop's scan: returns
    the carry dict after nfast substeps.  Substeps run KS at a time in
    one kernel call (default 2 with BJ=16 — halves kernel launches and
    the per-substep traffic of the field triples); the scalar
    coefficient table for all substeps is evaluated OUTSIDE the kernel
    (tiny) and rows ride through SMEM."""
    interpret = _interp()
    dtype = zeta0.dtype
    zeros = jnp.zeros_like(zeta0)
    # AB3 forcing-extrapolation coefficients (keyed on baroclinic step)
    a1 = jnp.where(iic == 0, 1.0, jnp.where(iic == 1, 1.5, 23.0 / 12.0))
    a2 = jnp.where(iic == 0, 0.0, jnp.where(iic == 1, 0.5, 16.0 / 12.0))
    a3 = jnp.where(iic <= 1, 0.0, 5.0 / 12.0)

    # per-substep scalar table (nfast, 7)
    iifs = jnp.arange(1, nfast + 1, dtype=jnp.int32)
    firstb = iifs == 1
    cffA1 = jnp.where(firstb, 0.0, w1j[jnp.maximum(iifs - 2, 0)])
    cffA2p = jnp.where(firstb,
                       (-1.0 / 12.0) * w2j[iifs],
                       (8.0 / 12.0) * w2j[iifs - 1]
                       - (1.0 / 12.0) * w2j[iifs])
    cffA2c = jnp.where(firstb, w2j[iifs - 1],
                       (5.0 / 12.0) * w2j[iifs - 1])
    ones = jnp.ones_like(cffA1)
    sc_all = jnp.stack([firstb.astype(dtype), cffA1, cffA2p, cffA2c,
                        a1 * ones, a2 * ones, a3 * ones],
                       axis=1).astype(dtype)

    carry0 = dict(
        zeta=zeta0, zeta_prev=zeta0, ubar=ubar0, ubar_prev=ubar0,
        vbar=vbar0, vbar_prev=vbar0,
        rzeta_prev=zeros, rubar_prev=zeros, rvbar_prev=zeros,
        rufrc=rufrc, rvfrc=rvfrc,
        Zt=zeros, DU1=zeros, DV1=zeros, DU2=zeros, DV2=zeros)
    static = dict(ru0=ru0_prev, rv0=rv0_prev,
                  ru0p2=ru0_prev2, rv0p2=rv0_prev2,
                  rhoS=rhoS, rhoA=rhoA)

    # KS=2 with BJ=16 is the validated pair; KS=3/BJ=24 produced
    # NaNs on the trajectory test (the shift-chain corruption depth
    # exceeds 6 rows/substep), so the chunk size is capped at 2.
    KS = int(os.environ.get("ROMS_TPU_P2D_KS", "2"))
    KS = max(1, min(KS, 2, nfast))
    BJ = 8 * KS

    def chunk(c, sc_rows, ks, bj):
        dyn = dict(c)
        for name in _POINTWISE:
            dyn.pop(name)
        dyn.update(static)
        point = {name: c[name] for name in _POINTWISE}
        o = _substep_call(cfg, grid, dyn, point, sc_rows, var_rho,
                          interpret, BJ=bj, KS=ks)
        return dict(
            zeta=o["zeta"], zeta_prev=o["zeta_prev"],
            ubar=o["ubar"], ubar_prev=o["ubar_prev"],
            vbar=o["vbar"], vbar_prev=o["vbar_prev"],
            rzeta_prev=o["rz"], rubar_prev=o["ru"],
            rvbar_prev=o["rv"],
            rufrc=o["rufrc"], rvfrc=o["rvfrc"],
            Zt=o["Zt"], DU1=o["DU1"], DV1=o["DV1"],
            DU2=o["DU2"], DV2=o["DV2"])

    nchunk, rem = divmod(nfast, KS)
    carry = carry0
    if nchunk:
        def body(c, i):
            rows = lax.dynamic_slice(
                sc_all, (i * KS, jnp.zeros_like(i)), (KS, 7))
            return chunk(c, rows, KS, BJ), None
        carry, _ = lax.scan(body, carry,
                            jnp.arange(nchunk, dtype=jnp.int32))
    for r in range(rem):
        rows = lax.dynamic_slice(sc_all, (nchunk * KS + r, 0), (1, 7))
        carry = chunk(carry, rows, 1, 8)
    return carry


def _interp():
    return os.environ.get("ROMS_TPU_PALLAS_STEP2D_INTERPRET", "") == "1"


# ---------------------------------------------------------------------------
# VMEM-resident whole-grid engine
# ---------------------------------------------------------------------------
#
# The ext-window engine above pays 3x-redundant compute per j-block and
# re-reads 39 field triples from HBM every KS substeps — measured SLOWER
# than the jnp lax.scan at every BENCHMARK size.  This engine removes
# both costs: the full 2-D grid is ONE block (a BENCHMARK3 field is
# only ~2.3 MB padded), the 16-field carry lives in the output VMEM
# blocks for the WHOLE fast loop, and a lax.fori_loop inside the kernel
# runs all nfast substeps back-to-back.  HBM traffic collapses to one
# read of the carry + statics and one write of the carry — everything
# between is VPU work on VMEM.  No halo windows, no redundant rows:
# row shifts wrap the whole grid and the in-kernel BCs overwrite the
# contaminated ring, exactly like the jnp engine's roll discipline.

_RES_E = ("zeta", "zeta_prev", "ubar", "ubar_prev", "vbar", "vbar_prev",
          "rzeta_prev", "rubar_prev", "rvbar_prev", "rufrc", "rvfrc")
_RES_CARRY = _RES_E + _POINTWISE      # 16 in-kernel carry fields


def _res_grid_names(uv_cor, curvgrid, visc_on):
    """Config-dependent grid-field subset (VMEM is the scarce
    resource).  All metric combinations (on_u, om_v, dndx/dmde, the
    nine viscosity metrics, pmask) are re-derived in-kernel from
    pm/pn/rmask at their use sites (C["derive"]) — scoped temporaries
    instead of loop-lifetime resident blocks."""
    names = ["h", "pm", "pn", "rmask", "umask", "vmask"]
    if uv_cor:
        names.append("fomn")
    if visc_on:
        names += ["visc2_r", "visc2_p"]
    return tuple(names)


_RES_H = 8          # seam halo rows (>= the 6-row/substep shift chain)
_RES_NTMP = 62      # measured Mosaic live-temp peak in substep bodies


def _res_blocks(Mj, NB):
    """Static eta-block geometry: (center_start, center_end,
    window_start, window_end) per block."""
    BJ = -(-Mj // NB)
    out = []
    for b in range(NB):
        cs, ce = b * BJ, min(Mj, (b + 1) * BJ)
        out.append((cs, ce, max(0, cs - _RES_H), min(Mj, ce + _RES_H)))
    return out


def _kernel_res(nfast, Mj, Li, nstat, NB, g, rho0, dtfast, gamma2,
                sal_scalar, var_rho, uv_adv, uv_cor, curvgrid, visc_on,
                stat_names, *refs):
    nd = len(_RES_CARRY)
    nE = len(_RES_E)
    ins = refs[:nd]
    stat = refs[nd:nd + nstat]
    sc = refs[nd + nstat]
    outs = refs[nd + nstat + 1: nd + nstat + 1 + nd]
    stash = refs[-2] if NB > 1 else None
    sem = refs[-1]

    # Carry initialization: DMA HBM inputs into the VMEM output blocks,
    # which then double as the loop state (avoids 16 input VMEM blocks).
    for i in range(nd):
        pltpu.make_async_copy(ins[i], outs[i], sem.at[i]).start()
    for i in range(nd):
        pltpu.make_async_copy(ins[i], outs[i], sem.at[i]).wait()

    blocks = _res_blocks(Mj, NB)

    def body(i, _):
        def scget(j):
            return sc[i, j]

        # Temporaries scale with the window, so large grids process the
        # substep in NB eta-blocks.  Blocks run south->north; each
        # block's south halo needs PRE-substep rows already overwritten
        # by the previous block, so those seam rows are stashed first.
        if NB > 1:
            for b in range(1, NB):
                cs = blocks[b][0]
                for k in range(nE):
                    stash[b - 1, k] = outs[k][cs - _RES_H:cs, :]

        for b, (cs, ce, ws, we) in enumerate(blocks):
            E = {}
            for k, name in enumerate(_RES_E):
                if b == 0:
                    E[name] = outs[k][ws:we, :]
                else:
                    E[name] = jnp.concatenate(
                        [stash[b - 1, k], outs[k][cs:we, :]], axis=0)
            for k, name in enumerate(stat_names):
                E[name] = stat[k][ws:we, :]
            P = {name: outs[nE + k][cs:ce, :]
                 for k, name in enumerate(_POINTWISE)}
            grow = (jax.lax.broadcasted_iota(jnp.int32, (we - ws, Li), 0)
                    + ws)
            off, nc = cs - ws, ce - cs
            C = dict(Mj=Mj, Li=Li, grow=grow, g=g, rho0=rho0,
                     dtfast=dtfast, gamma2=gamma2,
                     sal_scalar=sal_scalar, var_rho=var_rho,
                     uv_adv=uv_adv, uv_cor=uv_cor, curvgrid=curvgrid,
                     visc_on=visc_on, center_shape=(nc, Li),
                     ctr=lambda x, o=off, n=nc:
                         jax.lax.slice_in_dim(x, o, o + n, axis=0),
                     derive=True)
            En, Pn = _substep(E, P, scget, C)
            for k, name in enumerate(_RES_E):
                outs[k][cs:ce, :] = C["ctr"](En[name])
            for k, name in enumerate(_POINTWISE):
                outs[nE + k][cs:ce, :] = Pn[name]
        return 0

    jax.lax.fori_loop(0, nfast, body, 0)


def fast_loop_pallas_res(cfg, grid, nfast, w1j, w2j, var_rho,
                         zeta0, ubar0, vbar0, rufrc, rvfrc, rhoS, rhoA,
                         ru0_prev, rv0_prev, ru0_prev2, rv0_prev2, iic):
    """Whole-fast-loop-resident engine: one kernel call runs all nfast
    predictor+corrector substeps with the carry held in VMEM.  Same
    return contract as fast_loop_pallas."""
    interpret = _interp()
    dtype = zeta0.dtype
    Mj, Li = zeta0.shape
    zeros = jnp.zeros_like(zeta0)
    a1 = jnp.where(iic == 0, 1.0, jnp.where(iic == 1, 1.5, 23.0 / 12.0))
    a2 = jnp.where(iic == 0, 0.0, jnp.where(iic == 1, 0.5, 16.0 / 12.0))
    a3 = jnp.where(iic <= 1, 0.0, 5.0 / 12.0)

    iifs = jnp.arange(1, nfast + 1, dtype=jnp.int32)
    firstb = iifs == 1
    cffA1 = jnp.where(firstb, 0.0, w1j[jnp.maximum(iifs - 2, 0)])
    cffA2p = jnp.where(firstb,
                       (-1.0 / 12.0) * w2j[iifs],
                       (8.0 / 12.0) * w2j[iifs - 1]
                       - (1.0 / 12.0) * w2j[iifs])
    cffA2c = jnp.where(firstb, w2j[iifs - 1],
                       (5.0 / 12.0) * w2j[iifs - 1])
    ones = jnp.ones_like(cffA1)
    sc_all = jnp.stack([firstb.astype(dtype), cffA1, cffA2p, cffA2c,
                        a1 * ones, a2 * ones, a3 * ones],
                       axis=1).astype(dtype)

    # -a2*ru0 + a3*ru0p2 is substep-invariant: combine outside
    fu_hist = (-a2 * ru0_prev + a3 * ru0_prev2).astype(dtype)
    fv_hist = (-a2 * rv0_prev + a3 * rv0_prev2).astype(dtype)

    uv_cor = bool(cfg.uv_cor)
    curv = bool(cfg.curvgrid and cfg.uv_adv)
    visc_on = bool(cfg.mixing.visc2 > 0.0)
    gnames = _res_grid_names(uv_cor, curv, visc_on)
    stat_names = ("fu_hist", "fv_hist", "rhoS", "rhoA") + gnames

    dyn0 = dict(zeta=zeta0, zeta_prev=zeta0, ubar=ubar0,
                ubar_prev=ubar0, vbar=vbar0, vbar_prev=vbar0,
                rzeta_prev=zeros, rubar_prev=zeros, rvbar_prev=zeros,
                rufrc=rufrc, rvfrc=rvfrc, Zt=zeros, DU1=zeros,
                DV1=zeros, DU2=zeros, DV2=zeros)
    statf = dict(fu_hist=fu_hist, fv_hist=fv_hist,
                 rhoS=rhoS.astype(dtype), rhoA=rhoA.astype(dtype))
    for n in gnames:
        statf[n] = getattr(grid, n).astype(dtype)

    NB = _pick_nb(Mj, Li, jnp.dtype(dtype).itemsize, len(stat_names))
    NB = max(NB, 1)
    nb_env = os.environ.get("ROMS_TPU_FASTLOOP_RES_NB", "")
    if nb_env:
        NB = int(nb_env)

    args = ([dyn0[n] for n in _RES_CARRY]
            + [statf[n] for n in stat_names] + [sc_all])
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = ([anyspec] * len(_RES_CARRY)
                + [vspec] * len(stat_names)
                + [pl.BlockSpec(memory_space=pltpu.SMEM)])
    scratch = []
    if NB > 1:
        scratch.append(pltpu.VMEM((NB - 1, len(_RES_E), _RES_H, Li),
                                  dtype))
    scratch.append(pltpu.SemaphoreType.DMA((len(_RES_CARRY),)))

    outs = pl.pallas_call(
        functools.partial(
            _kernel_res, nfast, Mj, Li, len(stat_names), NB,
            float(cfg.g), float(cfg.rho0),
            float(cfg.dt / cfg.ndtfast), float(cfg.gamma2),
            float(cfg.sal_scalar or 0.0), bool(var_rho),
            bool(cfg.uv_adv), uv_cor, curv, visc_on, stat_names),
        out_shape=tuple(jax.ShapeDtypeStruct((Mj, Li), dtype)
                        for _ in _RES_CARRY),
        in_specs=in_specs,
        out_specs=tuple(vspec for _ in _RES_CARRY),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(*args)
    return dict(zip(_RES_CARRY, outs))


def _class_ok(cfg) -> bool:
    """EW-periodic channel with closed N/S walls, no aux 2D physics —
    the config class both Pallas fast-loop engines cover."""
    from ..config import CLOSED, PERIODIC
    bc = cfg.bc
    if not bc.ew_periodic or bc.ns_periodic or bc.volcons:
        return False
    for lbc in (bc.zeta, bc.ubar, bc.vbar):
        if lbc.west != PERIODIC or lbc.east != PERIODIC:
            return False
        if lbc.south != CLOSED or lbc.north != CLOSED:
            return False
    if cfg.wetdry:
        return False
    return True


def _pick_nb(Mj, Li, itemsize, nstat):
    """Smallest eta-block count whose VMEM estimate fits: 16 resident
    carry blocks + statics at full size, ~_RES_NTMP live temporaries
    at window size (measured from the Mosaic OOM report: 206.68 MB
    demanded whole-grid at BENCHMARK3 = 67 MB refs + ~140 MB temps).
    Returns 0 if no NB fits."""
    def pad(x, m):
        return -(-x // m) * m
    full = pad(Mj, 8) * pad(Li, 128) * itemsize
    budget = 118 * 1024 * 1024
    for NB in (1, 2, 3, 4, 6, 8, 12, 16):
        BJ = -(-Mj // NB)
        W = min(Mj, BJ + 2 * _RES_H)
        tmp = pad(W, 8) * pad(Li, 128) * itemsize
        stash = 0 if NB == 1 else ((NB - 1) * len(_RES_E)
                                   * pad(_RES_H, 8) * pad(Li, 128)
                                   * itemsize)
        if (16 + nstat) * full + _RES_NTMP * tmp + stash <= budget:
            return NB
    return 0


def use_pallas_fastloop_res(cfg, shape) -> bool:
    """Resident engine gate: config class + VMEM-fit estimate."""
    from .kernel_gate import pallas_enabled
    if not pallas_enabled():
        return False
    if not _class_ok(cfg):
        return False
    flag = os.environ.get("ROMS_TPU_FASTLOOP_RES", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    from .kernel_gate import dtype_supported
    if not dtype_supported(cfg.dtype):
        return False
    if not (jax.default_backend() == "tpu" and jax.device_count() == 1):
        return False
    Mj, Li = shape
    nstat = 4 + len(_res_grid_names(
        bool(cfg.uv_cor), bool(cfg.curvgrid and cfg.uv_adv),
        bool(cfg.mixing.visc2 > 0.0)))
    return _pick_nb(Mj, Li, jnp.dtype(cfg.dtype).itemsize, nstat) > 0


def use_pallas_step2d(cfg) -> bool:
    """Kernel covers the EW-periodic channel class with closed N/S
    walls and no auxiliary 2D physics; everything else -> jnp."""
    from .kernel_gate import pallas_enabled
    if not pallas_enabled():
        return False
    if not _class_ok(cfg):
        return False
    flag = os.environ.get("ROMS_TPU_PALLAS_STEP2D", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    # Default OFF: with the other dynamics kernels landed, the jnp
    # fast loop (whole-array lax.scan, XLA-fused) measured FASTER than
    # this kernel at every BENCHMARK size (BM1 7.5 vs 8.0, BM2 16.6 vs
    # 18.3, BM3 52.6 vs 56.6 ms/step same-session) — the ext-window
    # triple's 3x-redundant compute outweighs the launch savings.  The
    # kernel stays available via the env flag for future VMEM-resident
    # multi-substep work.
    return False
