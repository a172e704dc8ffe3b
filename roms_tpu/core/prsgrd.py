"""Baroclinic pressure gradient.

Default scheme: splines density Jacobian (Shchepetkin & McWilliams 2003),
re-implementing ROMS/Nonlinear/prsgrd32.h as whole-array expressions; the
harmonic-mean limiters become jnp.where selects.  Also provides the standard
Jacobian (prsgrd31.h) for comparison.

Outputs initialize ru/rv (m4/s2): every later RHS term adds to these.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants
from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st

_EPS = 1.0e-10


def _harmonic(a, b):
    """2ab/(a+b) where 2ab>eps else 0 (prsgrd32.h limiter).

    The denominator is guarded so reverse-mode AD never sees 0/0 (the
    unselected branch of jnp.where still propagates NaN cotangents)."""
    cff = 2.0 * a * b
    good = cff > _EPS
    den = jnp.where(good, a + b, 1.0)
    return jnp.where(good, cff / den, 0.0)


def _harmonic_z(a, b):
    """dZ harmonic mean without positivity gate (prsgrd32.h:181)."""
    return 2.0 * a * b / (a + b)


def prsgrd32(cfg: ModelConfig, grid: Grid, rho, z_r, z_w, Hz,
             eq_tide=None, Pair=None):
    """Splines density-Jacobian pressure gradient (prsgrd32.h:158-378).

    rho: density anomaly (N, Mj, Li); returns (ru, rv) in m4/s2.
    """
    g = cfg.g
    GRho = g / cfg.rho0
    HalfGRho = 0.5 * GRho
    OneFifth = 0.2
    OneTwelfth = 1.0 / 12.0
    N = rho.shape[0]

    # ---- vertical spline derivatives dR, dZ at interfaces 0..N ----------
    dR_i = rho[1:] - rho[:-1]            # (N-1,...) interfaces 1..N-1
    dZ_i = z_r[1:] - z_r[:-1]
    dR = jnp.concatenate([dR_i[:1], dR_i, dR_i[-1:]], axis=0)   # 0..N
    dZ = jnp.concatenate([dZ_i[:1], dZ_i, dZ_i[-1:]], axis=0)
    # harmonic averages onto rho levels k=1..N (index 0..N-1 below)
    dRm = _harmonic(dR[1:], dR[:-1])     # (N,...)
    dZm = _harmonic_z(dZ[1:], dZ[:-1])

    # ---- pressure at rho points, integrated downward (:189-219) ---------
    cff1 = 1.0 / (z_r[-1] - z_r[-2])
    cff2 = 0.5 * (rho[-1] - rho[-2]) * (z_w[-1] - z_r[-1]) * cff1
    P_top = g * (1.0 - cfg.sal_scalar) * z_w[-1] \
        + GRho * (rho[-1] + cff2) * (z_w[-1] - z_r[-1])
    zice = getattr(grid, "zice", None)
    if zice is not None:
        # ICESHELF hydrostatic ice load: a floating shelf presses with
        # the weight of the displaced water column — background
        # (g*|zice|) plus its density anomaly, approximated with the
        # ice-base in-situ value, so the surface-potential deficit of
        # z_w(N)=zeta-|zice| cancels and a resting stratified cavity
        # stays balanced (exactly for uniform anomaly; to the
        # compressibility gradient otherwise).  The reference's
        # prsgrd32.h:276 carries no such term, which leaves an
        # O(g grad|zice|) spurious force at the ice front from rest.
        draft = jnp.abs(zice)
        P_top = P_top + (g + GRho * (rho[-1] + cff2)) * draft
    if eq_tide is not None:
        # tide generating body force enters as a surface pressure
        # deficit (TIDE_GENERATING_FORCES, prsgrd32.h:286)
        P_top = P_top - g * eq_tide
    if Pair is not None:
        # inverse barometer: sea-level pressure anomaly in millibars
        # (ATM_PRESS, prsgrd32.h:241-281)
        P_top = P_top + 100.0 / cfg.rho0 * (Pair - 1013.25)
    # increments between levels k+1 and k (N-1 of them, top-down)
    dP = HalfGRho * ((rho[1:] + rho[:-1]) * (z_r[1:] - z_r[:-1])
                     - OneFifth * ((dRm[1:] - dRm[:-1])
                                   * (z_r[1:] - z_r[:-1]
                                      - OneTwelfth * (dZm[1:] + dZm[:-1]))
                                   - (dZm[1:] - dZm[:-1])
                                   * (rho[1:] - rho[:-1]
                                      - OneTwelfth * (dRm[1:] + dRm[:-1]))))
    # P[k] = P_top + sum_{m=k}^{N-2} dP[m]
    csum = jnp.cumsum(dP[::-1], axis=0)[::-1]          # (N-1,...)
    P = jnp.concatenate([P_top[None] + csum, P_top[None]], axis=0)

    # ---- xi-direction (:228-300) ----------------------------------------
    aux = (z_r - st.im1(z_r)) * grid.umask          # at u cols
    FC = (rho - st.im1(rho)) * grid.umask
    if cfg.bc.ew_periodic:
        aux = st.periodic_x(aux)
        FC = st.periodic_x(FC)
    dZx = _harmonic(aux, st.ip1(aux))
    dRx = _harmonic(FC, st.ip1(FC))
    if cfg.bc.ew_periodic:
        dZx = st.periodic_x(dZx)
        dRx = st.periodic_x(dRx)
    ru = grid.on_u * 0.5 * (Hz + st.im1(Hz)) * (
        st.im1(P) - P - HalfGRho * (
            (rho + st.im1(rho)) * (z_r - st.im1(z_r))
            - OneFifth * ((dRx - st.im1(dRx))
                          * (z_r - st.im1(z_r)
                             - OneTwelfth * (dZx + st.im1(dZx)))
                          - (dZx - st.im1(dZx))
                          * (rho - st.im1(rho)
                             - OneTwelfth * (dRx + st.im1(dRx))))))

    # ---- eta-direction (:306-377) ----------------------------------------
    auy = (z_r - st.jm1(z_r)) * grid.vmask
    FE = (rho - st.jm1(rho)) * grid.vmask
    if cfg.bc.ns_periodic:
        auy = st.periodic_y(auy)
        FE = st.periodic_y(FE)
    dZe = _harmonic(auy, st.jp1(auy))
    dRe = _harmonic(FE, st.jp1(FE))
    if cfg.bc.ns_periodic:
        dZe = st.periodic_y(dZe)
        dRe = st.periodic_y(dRe)
    rv = grid.om_v * 0.5 * (Hz + st.jm1(Hz)) * (
        st.jm1(P) - P - HalfGRho * (
            (rho + st.jm1(rho)) * (z_r - st.jm1(z_r))
            - OneFifth * ((dRe - st.jm1(dRe))
                          * (z_r - st.jm1(z_r)
                             - OneTwelfth * (dZe + st.jm1(dZe)))
                          - (dZe - st.jm1(dZe))
                          * (rho - st.jm1(rho)
                             - OneTwelfth * (dRe + st.jm1(dRe))))))

    return ru, rv


def prsgrd40(cfg: ModelConfig, grid: Grid, rho, z_r, z_w, Hz,
             eq_tide=None, Pair=None):
    """Finite-volume pressure Jacobian of Lin (1997) (prsgrd40.h).

    P is accumulated downward in density-thickness units
    (P[k-1] = P[k] + Hz[k]*rho[k], prsgrd40.h:224-229); FX is the
    per-cell vertical integral of pressure; the face term FC integrates
    P along the sloping interface; the free-surface slope enters as an
    explicit barotropic term (prsgrd40.h:238-252).  Returns (ru, rv)
    in m4/s2.
    """
    g = cfg.g
    GRho = g / cfg.rho0

    Mj, Li = rho.shape[-2:]
    P_top = jnp.zeros((Mj, Li), rho.dtype)
    if Pair is not None:
        # ATM_PRESS (prsgrd40.h:205-209): fac=100/g, 1 atm = 1013.25 mb
        P_top = P_top + (100.0 / g) * (Pair - 1013.25)
    if eq_tide is not None:
        P_top = P_top - g * eq_tide

    # interface pressures, downward accumulation (N+1, Mj, Li)
    rhoHz = Hz * rho
    below = jnp.cumsum(rhoHz[::-1], axis=0)[::-1]      # sum_{m>=k}
    P = jnp.concatenate([P_top[None] + below, P_top[None]], axis=0)
    # per-cell vertical pressure integral
    FX = 0.5 * Hz * (P[1:] + P[:-1])

    def one_dir(shift_m, metric, mask, periodic, perf):
        Pm, zwm = shift_m(P), shift_m(z_w)
        Hzm, FXm = shift_m(Hz), shift_m(FX)
        if periodic:
            Pm, zwm = perf(Pm), perf(zwm)
            Hzm, FXm = perf(Hzm), perf(FXm)
        # FC at interfaces 0..N-1 (prsgrd40.h:240-242); FC[N]=0
        FC_i = 0.5 * (z_w[:-1] - zwm[:-1]) * (P[:-1] + Pm[:-1])
        zero = jnp.zeros_like(FC_i[:1])
        FC = jnp.concatenate([FC_i, zero], axis=0)
        surf = 0.5 * g * (1.0 - cfg.sal_scalar) * (Hzm + Hz) * \
            (zwm[-1] - z_w[-1])[None]
        return (surf + GRho * (FXm - FX + FC[1:] - FC[:-1])) \
            * metric[None] * mask[None]

    ru = one_dir(st.im1, grid.on_u, grid.umask, cfg.bc.ew_periodic,
                 st.periodic_x)
    rv = one_dir(st.jm1, grid.om_v, grid.vmask, cfg.bc.ns_periodic,
                 st.periodic_y)
    return ru, rv


def prsgrd31(cfg: ModelConfig, grid: Grid, rho, z_r, z_w, Hz,
             wj_gradp: bool = False):
    """Standard density Jacobian (prsgrd31.h): downward accumulation of
    the geopotential gradient phix/phie with the discrete Jacobian
    correction.  wj_gradp=True activates the WJ_GRADP weighted-Jacobian
    variant (prsgrd31.h WJ branch): the vertical averaging weights are
    skewed by gamma where adjacent columns have unequal layer
    thicknesses, reducing the error over steep terrain."""
    g = cfg.g
    fac1 = 0.5 * g / cfg.rho0
    fac3 = 0.25 * g / cfg.rho0
    if getattr(grid, "zice", None) is not None:
        raise NotImplementedError(
            "ICESHELF ice-load closure lives in prsgrd32 (djs)")

    def one_dir(shift_m):
        drho = rho - shift_m(rho)                # at u/v points, all k
        dzr = z_r - shift_m(z_r)
        dzw_t = (z_w[-1] - z_r[-1]) + (shift_m(z_w)[-1] - shift_m(z_r)[-1])
        # surface slab (prsgrd31.h:150-175)
        phi_top = fac1 * drho[-1] * dzw_t
        # interior increments between k+1 and k (N-1 of them, top-down)
        if wj_gradp:
            dz_i = z_r[1:] - z_r[:-1]
            dz_m = shift_m(z_r)[1:] - shift_m(z_r)[:-1]
            gamma = 0.125 * (1.0 / (dz_i * dz_m)) * \
                (dzr[:-1] + dzr[1:]) * (dz_i - dz_m)
            cff1 = (1.0 + gamma) * drho[1:] + (1.0 - gamma) * drho[:-1]
            cff4 = (1.0 + gamma) * dzr[1:] + (1.0 - gamma) * dzr[:-1]
        else:
            cff1 = drho[1:] + drho[:-1]
            cff4 = dzr[1:] + dzr[:-1]
        cff2 = (rho[1:] + shift_m(rho)[1:]) - (rho[:-1] + shift_m(rho)[:-1])
        cff3 = (z_r[1:] + shift_m(z_r)[1:]) - (z_r[:-1] + shift_m(z_r)[:-1])
        dphi = fac3 * (cff1 * cff3 - cff2 * cff4)
        # phi[k] = phi_top + sum_{m=k}^{N-2} dphi[m]
        csum = jnp.cumsum(dphi[::-1], axis=0)[::-1]
        phi = jnp.concatenate([phi_top[None] + csum, phi_top[None]],
                              axis=0)
        return phi

    phix = one_dir(st.im1)
    phie = one_dir(st.jm1)
    ru = -0.5 * (Hz + st.im1(Hz)) * phix * grid.on_u[None]
    rv = -0.5 * (Hz + st.jm1(Hz)) * phie * grid.om_v[None]
    return ru, rv


def _weno_parabolic(rho, Hz, eps=1.0e-8):
    """Parabolic WENO side limits + weighted interface densities
    (shared by prsgrd42/prsgrd44; prsgrd44.h:229-295).

    Returns (r1, aR, aL) with r1 the (N+1,...) interface densities
    (non-NEUMANN boundary extrapolation) and aR/aL the per-cell side
    limits."""
    d_i = (rho[1:] - rho[:-1]) / (Hz[1:] + Hz[:-1])   # (N-1,...)

    dR_c = Hz[1:-1] * d_i[1:]
    dL_c = Hz[1:-1] * d_i[:-1]
    opp = dR_c * dL_c < 0.0
    dR_c = jnp.where(opp, 0.0, dR_c)
    dL_c = jnp.where(opp, 0.0, dL_c)
    cffc = Hz[:-2] + 2.0 * Hz[1:-1] + Hz[2:]
    cffR = cffc * d_i[1:]
    cffL = cffc * d_i[:-1]
    dR_c = jnp.where(jnp.abs(dR_c) > jnp.abs(cffL), cffL, dR_c)
    dL_c = jnp.where(jnp.abs(dL_c) > jnp.abs(cffR), cffR, dL_c)
    cfft = (dR_c - dL_c) / (Hz[:-2] + Hz[1:-1] + Hz[2:])
    dR_c = dR_c - cfft * Hz[2:]
    dL_c = dL_c + cfft * Hz[:-2]
    aR_int = rho[1:-1] + dR_c
    aL_int = rho[1:-1] - dL_c
    dRq_int = (2.0 * dR_c - dL_c) ** 2
    dLq_int = (2.0 * dL_c - dR_c) ** 2

    aL_top = aR_int[-1]
    aR_top = 2.0 * rho[-1] - aL_top
    dR_top = (2.0 * aR_top + aL_top - 3.0 * rho[-1]) ** 2
    dL_top = (3.0 * rho[-1] - 2.0 * aL_top - aR_top) ** 2
    aR_bot = aL_int[0]
    aL_bot = 2.0 * rho[0] - aR_bot
    dR_bot = (2.0 * aR_bot + aL_bot - 3.0 * rho[0]) ** 2
    dL_bot = (3.0 * rho[0] - 2.0 * aL_bot - aR_bot) ** 2

    aR = jnp.concatenate([aR_bot[None], aR_int, aR_top[None]], axis=0)
    aL = jnp.concatenate([aL_bot[None], aL_int, aL_top[None]], axis=0)
    dRq = jnp.concatenate([dR_bot[None], dRq_int, dR_top[None]],
                          axis=0)
    dLq = jnp.concatenate([dL_bot[None], dLq_int, dL_top[None]],
                          axis=0)

    wL = jnp.maximum(dLq[:-1], eps)
    wR = jnp.maximum(dRq[1:], eps)
    r1_i = (wR * aR[:-1] + wL * aL[1:]) / (wR + wL)   # (N-1,...)
    r1_N = 2.0 * rho[-1] - r1_i[-1]
    r1_0 = 2.0 * rho[0] - r1_i[0]
    r1 = jnp.concatenate([r1_0[None], r1_i, r1_N[None]], axis=0)
    return r1, aR, aL


def _minmod3(dR, dL):
    """Three-way harmonic-ish limiter of prsgrd42.h:318-332."""
    return jnp.where(
        dR * dL < 0.0, 0.0,
        jnp.where(jnp.abs(dR) > 2.0 * jnp.abs(dL), 3.0 * dL,
                  jnp.where(jnp.abs(dL) > 2.0 * jnp.abs(dR), 3.0 * dR,
                            dR + dL)))


def _p_and_surface(cfg, grid, rho, Hz, eq_tide, Pair):
    """Interface pressure accumulation shared by the FV schemes."""
    g = cfg.g
    P_top = jnp.zeros_like(rho[0])
    if Pair is not None:
        P_top = P_top + (100.0 / g) * (Pair - 1013.25)
    if eq_tide is not None:
        P_top = P_top - g * eq_tide
    if getattr(grid, "zice", None) is not None:
        raise NotImplementedError(
            "ICESHELF ice-load closure is implemented for the splines "
            "density-Jacobian scheme (prsgrd32) only; use cfg.prsgrd="
            "'djs' for ice-shelf cavities")
    rhoHz = Hz * rho
    below = jnp.cumsum(rhoHz[::-1], axis=0)[::-1]
    return jnp.concatenate([P_top[None] + below, P_top[None]], axis=0)


def prsgrd42(cfg: ModelConfig, grid: Grid, rho, z_r, z_w, Hz,
             eq_tide=None, Pair=None):
    """Finite-volume scheme with parabolic WENO interface densities and
    minmod-limited quadratic corrections plus the upstream-biased
    sigma-correction stage (prsgrd42.h).  Returns (ru, rv) m4/s2."""
    g = cfg.g
    GRho05 = 0.5 * g / cfg.rho0
    c6, c24 = 1.0 / 6.0, g / (24.0 * cfg.rho0)
    eps = 1.0e-8

    r_f, _, _ = _weno_parabolic(rho, Hz, eps)
    P = _p_and_surface(cfg, grid, rho, Hz, eq_tide, Pair)
    rrv = _minmod3(r_f[1:] - rho, rho - r_f[:-1])
    FX = 0.5 * Hz * (P[1:] + P[:-1] + c6 * rrv * Hz)

    def raw_dir(shift_m, mask, periodic, perf):
        Pm, rm = shift_m(P), shift_m(r_f)
        zwm, Hzm, FXm = shift_m(z_w), shift_m(Hz), shift_m(FX)
        if periodic:
            Pm, rm = perf(Pm), perf(rm)
            zwm, Hzm, FXm = perf(zwm), perf(Hzm), perf(FXm)
        dh = z_w[:-1] - zwm[:-1]
        delP = Pm[:-1] - P[:-1]
        rr = _minmod3(dh * r_f[:-1] - delP, delP - dh * rm[:-1])
        FC_i = 0.5 * dh * (P[:-1] + Pm[:-1] + c6 * rr)
        FC = jnp.concatenate([FC_i, jnp.zeros_like(FC_i[:1])], axis=0)
        raw = 2.0 * (FXm - FX + FC[1:] - FC[:-1]) / (Hzm + Hz)
        return raw * mask[None], zwm, Hzm

    def finalize(raw, zwm, Hzm, shift_m, shift_p, metric,
                 periodic, perf):
        # upstream-biased sigma correction (prsgrd42.h:415-470)
        rawm = shift_m(raw)
        rawp = shift_p(raw)
        if periodic:
            rawm, rawp = perf(rawm), perf(rawp)
        dhk = c24 * (z_w[1:-1] - shift_m(z_w)[1:-1])   # interfaces 1..N-1
        FCk = jnp.maximum(dhk, 0.0) * (raw[1:] + rawp[:-1]
                                       - raw[:-1] - rawm[1:]) \
            + jnp.minimum(dhk, 0.0) * (raw[:-1] + rawp[1:]
                                       - raw[1:] - rawm[:-1])
        dh0 = c24 * (z_w[0] - shift_m(z_w)[0])
        FC0 = jnp.maximum(dh0, 0.0) * (raw[0] - rawm[0]) \
            + jnp.minimum(dh0, 0.0) * (rawp[0] - raw[0])
        zt = jnp.zeros_like(FC0[None])
        FC = jnp.concatenate([FC0[None], FCk, zt], axis=0)  # 0..N
        out = (0.5 * g * (1.0 - cfg.sal_scalar)
               * (zwm[-1] - z_w[-1])[None]
               + GRho05 * raw) * (Hzm + Hz) * metric[None] \
            + (FC[1:] - FC[:-1]) * metric[None]
        return out

    raw_u, zwm_u, Hzm_u = raw_dir(st.im1, grid.umask,
                                  cfg.bc.ew_periodic, st.periodic_x)
    ru = finalize(raw_u, zwm_u, Hzm_u, st.im1, st.ip1, grid.on_u,
                  cfg.bc.ew_periodic, st.periodic_x)
    raw_v, zwm_v, Hzm_v = raw_dir(st.jm1, grid.vmask,
                                  cfg.bc.ns_periodic, st.periodic_y)
    rv = finalize(raw_v, zwm_v, Hzm_v, st.jm1, st.jp1, grid.om_v,
                  cfg.bc.ns_periodic, st.periodic_y)
    return ru, rv


def prsgrd44(cfg: ModelConfig, grid: Grid, rho, z_r, z_w, Hz,
             eq_tide=None, Pair=None):
    """Monotonized-quartic finite-volume scheme (prsgrd44.h): WENO
    reconciliation, power-law side derivatives, Pade amplitude
    correction of the interface densities, and limited face integrals.
    Returns (ru, rv) m4/s2."""
    g = cfg.g
    GRho = g / cfg.rho0
    c6, c12 = 1.0 / 6.0, 1.0 / 12.0
    eps = 1.0e-8

    r1, aR, aL = _weno_parabolic(rho, Hz, eps)
    FCi = 1.0 / (Hz[1:] + Hz[:-1])

    # ---- power-law side derivatives per cell (prsgrd44.h:297-341) ------
    deltaR = r1[1:] - rho
    deltaL = rho - r1[:-1]
    cffp = deltaR * deltaL
    cffp = jnp.where(cffp > eps, (deltaR + deltaL)
                     / jnp.where(cffp > eps, cffp, 1.0), 0.0)
    cL = cffp * deltaL
    cR = cffp * deltaR
    caseA = cL > 3.0
    caseB = (~caseA) & (cR > 3.0)
    cffL_f = jnp.where(caseA, cL * deltaL,
                       jnp.where(caseB, 0.0,
                                 4.0 * deltaL - 2.0 * deltaR))
    cffR_f = jnp.where(caseA, 0.0,
                       jnp.where(caseB, cR * deltaR,
                                 4.0 * deltaR - 2.0 * deltaL))
    dRd = cffR_f / Hz
    dLd = cffL_f / Hz

    # ---- interface derivative + Pade reconciliation (:343-384) ---------
    dd = FCi * (Hz[1:] * dLd[1:] + Hz[:-1] * dRd[:-1])
    cffRc = 8.0 * (dRd[:-1] + 2.0 * dLd[:-1])
    cffLc = 8.0 * (dLd[1:] + 2.0 * dRd[1:])
    dd = jnp.where(jnp.abs(dd) > jnp.abs(cffRc), cffRc, dd)
    dd = jnp.where(jnp.abs(dd) > jnp.abs(cffLc), cffLc, dd)
    up = (dLd[1:] - dRd[:-1]) * (rho[1:] - rho[:-1]) > 0.0
    Hdd = jnp.where(up, Hz[:-1] * (dd - dRd[:-1]),
                    Hz[1:] * (dLd[1:] - dd))
    rr = jnp.abs(jnp.where(up, rho[:-1] - r1[:-2], r1[2:] - rho[1:]))
    Ampl = 0.2 * Hdd * rr
    Hdda = jnp.abs(Hdd)
    cffq = rr * rr + 0.0763636363636363636 * Hdda * \
        (rr + 0.004329004329004329 * Hdda)
    Ampl = jnp.where(cffq > eps,
                     Ampl * (rr + 0.0363636363636363636 * Hdda)
                     / jnp.where(cffq > eps, cffq, 1.0), 0.0)
    r_i = r1[1:-1] + Ampl
    r_f = jnp.concatenate([(2.0 * rho[0] - r_i[0])[None], r_i,
                           (2.0 * rho[-1] - r_i[-1])[None]], axis=0)
    d_f = jnp.concatenate([dd[:1], dd, dd[-1:]], axis=0)

    # ---- pressure + cell integrals (:400-425) --------------------------
    P = _p_and_surface(cfg, grid, rho, Hz, eq_tide, Pair)
    FX = 0.5 * Hz * (P[1:] + P[:-1]
                     + 0.2 * Hz * (r_f[1:] - r_f[:-1]
                                   - c12 * Hz * (d_f[1:] + d_f[:-1])))

    def one_dir(shift_m, metric, mask, periodic, perf):
        Pm, rm, dm = shift_m(P), shift_m(r_f), shift_m(d_f)
        zwm, Hzm, FXm = shift_m(z_w), shift_m(Hz), shift_m(FX)
        if periodic:
            Pm, rm, dm = perf(Pm), perf(rm), perf(dm)
            zwm, Hzm, FXm = perf(zwm), perf(Hzm), perf(FXm)
        dh = z_w[:-1] - zwm[:-1]
        delP = Pm[:-1] - P[:-1]
        rrf = 0.5 * dh * (r_f[:-1] + rm[:-1]
                          - c6 * dh * (d_f[:-1] - dm[:-1]))
        limtr = 2.0 * delP * rrf
        den = rrf * rrf + delP * delP
        limtr = jnp.where(limtr > eps * den,
                          limtr / jnp.where(den > 0.0, den, 1.0), 0.0)
        FC_i = 0.5 * dh * (P[:-1] + Pm[:-1]
                           + limtr * 0.2 * dh
                           * (r_f[:-1] - rm[:-1]
                              - c12 * dh * (d_f[:-1] + dm[:-1])))
        FC = jnp.concatenate([FC_i, jnp.zeros_like(FC_i[:1])], axis=0)
        surf = 0.5 * g * (1.0 - cfg.sal_scalar) * (Hzm + Hz) * \
            (zwm[-1] - z_w[-1])[None]
        return (surf + GRho * (FXm - FX + FC[1:] - FC[:-1])) \
            * metric[None] * mask[None]

    ru = one_dir(st.im1, grid.on_u, grid.umask, cfg.bc.ew_periodic,
                 st.periodic_x)
    rv = one_dir(st.jm1, grid.om_v, grid.vmask, cfg.bc.ns_periodic,
                 st.periodic_y)
    return ru, rv
