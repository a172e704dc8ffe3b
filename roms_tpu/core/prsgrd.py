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
