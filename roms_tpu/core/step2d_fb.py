"""Fast barotropic engine: generalized FB AB3-AM4 (Shchepetkin 2009).

The reference ships this kernel (ROMS/Nonlinear/step2d_FB.h) but never
wires it — main3d's call sequence exists (main3d.F:656-703) yet no
header includes it.  Here it is wired as the modern alternative to
LF-AM3, selected by cfg.step2d == 'fb':

  - free surface: Forward step with AB3-extrapolated fluxes
      Drhs/urhs/vrhs = fwd0*q(m) + fwd1*q(m-1) + fwd2*q(m-2),
      (fwd = (1.781105, -1.06221, 0.281105) after startup,
      step2d_FB.h:594-630);
  - momentum: Backward (AM4-interpolated) pressure gradient
      zwrk = bkw_new*zeta(m+1) + bkw0*zeta(m) + bkw1*zeta(m-1)
           + bkw2*zeta(m-2), bkw = (0.614, 0.285, 0.0880, 0.013);
  - one stage per fast step (no predictor/corrector — half the 2D
    work of LF-AM3);
  - SOLVE3D coupling: advection/Coriolis/viscosity stay frozen inside
    rufrc/rvfrc (step2d_FB.h "suppressing the computation" note); the
    2D RHS is pressure gradient only.  rufrc conversion happens on the
    first fast step with AB3 forward extrapolation (cfwd coefficients,
    step2d_FB.h:1418-1431) and the PGF_FB_CORRECTION shifts the
    first-step pressure gradient from kstp to knew
    (step2d_FB.h:1477-1545).

Same fast-averaging weights and return interface as the LF-AM3 engine
(core.step2d.make_fast_loop) so the Model swaps engines freely.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from typing import NamedTuple

from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st
from .step2d import (FastAverages, _flux_state, _gzeta, _pg2d,
                     _uv_bc, _zeta_bc)

# AB3-AM4 coefficients (step2d_FB.h:618-630)
_FWD = (1.781105, -1.06221, 0.281105)
_BKW = (0.614, 0.285, 0.0880, 0.013)     # bkw_new, bkw0, bkw1, bkw2
# AB2-AM3 second-step set (:610-616)
_BKW2ND = (1.0833333333333, -0.1666666666666, 0.0833333333333, 0.0)


class FBCarry(NamedTuple):
    zeta: jnp.ndarray        # fast time m
    zeta_bak: jnp.ndarray    # m-1
    zeta_old: jnp.ndarray    # m-2
    ubar: jnp.ndarray
    ubar_bak: jnp.ndarray
    ubar_old: jnp.ndarray
    vbar: jnp.ndarray
    vbar_bak: jnp.ndarray
    vbar_old: jnp.ndarray
    rufrc: jnp.ndarray       # converted 2D<-3D forcing (frozen)
    rvfrc: jnp.ndarray
    ru0: jnp.ndarray         # rufrc_bak written on the first step
    rv0: jnp.ndarray
    avg: FastAverages


def make_fast_loop_fb(cfg: ModelConfig, nfast: int, w1, w2,
                      var_rho: bool = True):
    """FB AB3-AM4 fast loop with the make_fast_loop interface."""
    dtype = jnp.dtype(cfg.dtype)
    dtfast = cfg.dt / cfg.ndtfast
    w1j = jnp.asarray(w1, dtype)
    w2j = jnp.asarray(w2, dtype)

    def substep(grid, iif, c: FBCarry, rhoS, rhoA, iic,
                ru0_prev2, rv0_prev2, obc, sources=None,
                stokes2d=None):
        pmn = grid.pm * grid.pn
        pmn4_u = (grid.pm + st.im1(grid.pm)) * \
            (grid.pn + st.im1(grid.pn))
        pmn4_v = (grid.pm + st.jm1(grid.pm)) * \
            (grid.pn + st.jm1(grid.pn))
        first = (iif == 1)
        second = (iif == 2)

        def pick(a_first, a_second, a_else):
            return jnp.where(first, a_first,
                             jnp.where(second, a_second, a_else))

        fwd0 = pick(1.0, 1.0, _FWD[0])
        fwd1 = pick(0.0, 0.0, _FWD[1])
        fwd2 = pick(0.0, 0.0, _FWD[2])
        # SOLVE3D first step: PG at kstp (bkw_new=0, bkw0=1), then the
        # PGF_FB_CORRECTION below shifts it to knew
        bkw_new = pick(0.0, _BKW2ND[0], _BKW[0])
        bkw0 = pick(1.0, _BKW2ND[1], _BKW[1])
        bkw1 = pick(0.0, _BKW2ND[2], _BKW[2])
        bkw2 = pick(0.0, _BKW2ND[3], _BKW[3])

        # ---- AB3-extrapolated flux state (step2d_FB.h:664-698) ----------
        z_rhs = fwd0 * c.zeta + fwd1 * c.zeta_bak + fwd2 * c.zeta_old
        u_rhs = fwd0 * c.ubar + fwd1 * c.ubar_bak + fwd2 * c.ubar_old
        v_rhs = fwd0 * c.vbar + fwd1 * c.vbar_bak + fwd2 * c.vbar_old
        Drhs, DUon, DVom = _flux_state(cfg, grid, z_rhs, u_rhs, v_rhs,
                                       sources, stokes2d)

        # ---- forward free-surface step (:745-770) -----------------------
        div = (DUon - st.ip1(DUon)) + (DVom - st.jp1(DVom))
        zeta_new = (c.zeta + pmn * dtfast * div) * grid.rmask
        if sources is not None:
            zeta_new = zeta_new + sources.qbar * pmn * dtfast
        zeta_new = _zeta_bc(cfg, zeta_new, grid, c.zeta, dtfast, obc)
        Dnew = zeta_new + grid.h

        # ---- fast-time averaging (:840-875) -----------------------------
        cffA1 = w1j[iif - 1]
        cffA2 = w2j[iif - 1]
        avg = c.avg
        Zt = jnp.where(first, 0.0, avg.Zt_avg1) + cffA1 * zeta_new
        DU2 = jnp.where(first, 0.0, avg.DU_avg2) + cffA2 * DUon
        DV2 = jnp.where(first, 0.0, avg.DV_avg2) + cffA2 * DVom
        DU1 = jnp.where(first, 0.0, avg.DU_avg1)
        DV1 = jnp.where(first, 0.0, avg.DV_avg1)

        # ---- backward (AM4) pressure gradient (:760-840) ----------------
        zwrk = bkw_new * zeta_new + bkw0 * c.zeta \
            + bkw1 * c.zeta_bak + bkw2 * c.zeta_old
        gz, gz2, gzSA = _gzeta(cfg, rhoS, rhoA, zwrk, var_rho)
        rubar, rvbar = _pg2d(cfg, grid, gz, gz2, gzSA, zwrk, rhoA,
                             var_rho)

        # ---- first-step coupling: rufrc conversion + extrapolation ------
        # (step2d_FB.h:1414-1474)
        a0 = jnp.where(iic == 0, 1.0,
                       jnp.where(iic == 1, 1.5, 1.5 + 0.281105))
        a1c = jnp.where(iic == 0, 0.0,
                        jnp.where(iic == 1, -0.5,
                                  -0.5 - 2.0 * 0.281105))
        a2c = jnp.where(iic <= 1, 0.0, 0.281105)
        cffu = c.rufrc - rubar
        cffv = c.rvfrc - rvbar
        rufrc_x = a0 * cffu + a1c * c.ru0 + a2c * ru0_prev2
        rvfrc_x = a0 * cffv + a1c * c.rv0 + a2c * rv0_prev2
        rufrc_c = jnp.where(first, rufrc_x, c.rufrc)
        rvfrc_c = jnp.where(first, rvfrc_x, c.rvfrc)
        ru0_new = jnp.where(first, cffu, c.ru0)
        rv0_new = jnp.where(first, cffv, c.rv0)

        # PGF_FB_CORRECTION (:1477-1545): shift the first-step pressure
        # gradient from kstp to knew
        zdiff = zeta_new - c.zeta
        gzc, gzc2, gzcSA = _gzeta(cfg, rhoS, rhoA, zdiff, var_rho)
        # rzeta2 of the correction uses (zeta_new + zeta_kstp)
        if var_rho:
            fac = 1000.0 / cfg.rho0
            gzc2 = (fac + rhoS) * zdiff * (zeta_new + c.zeta)
        else:
            gzc2 = zdiff * (zeta_new + c.zeta)
        ru_corr, rv_corr = _pg2d(cfg, grid, gzc, gzc2, gzcSA, zdiff,
                                 rhoA, var_rho)
        rubar = rubar + jnp.where(first, ru_corr, 0.0)
        rvbar = rvbar + jnp.where(first, rv_corr, 0.0)

        # ---- momentum step with the frozen forcing (:1620-1690) ---------
        Dstp = c.zeta + grid.h
        Du_stp = Dstp + st.im1(Dstp)
        Dv_stp = Dstp + st.jm1(Dstp)
        Du_new = Dnew + st.im1(Dnew)
        Dv_new = Dnew + st.jm1(Dnew)
        cff3u = 0.5 * dtfast * pmn4_u
        cff3v = 0.5 * dtfast * pmn4_v
        ubar_new = (c.ubar * Du_stp
                    + cff3u * (rubar + rufrc_c)) / Du_new
        vbar_new = (c.vbar * Dv_stp
                    + cff3v * (rvbar + rvfrc_c)) / Dv_new
        ubar_new = ubar_new * grid.umask
        vbar_new = vbar_new * grid.vmask
        ubar_new, vbar_new = _uv_bc(cfg, grid, ubar_new, vbar_new,
                                    c.zeta, c.ubar, c.vbar, obc,
                                    z_new=zeta_new, dt2d=dtfast)

        # DU_avg1 accumulates the new transports (:1645-1652)
        DU1 = DU1 + 0.5 * cffA1 * grid.on_u * Du_new * ubar_new
        DV1 = DV1 + 0.5 * cffA1 * grid.om_v * Dv_new * vbar_new
        avg = FastAverages(Zt, DU1, DV1, DU2, DV2)

        return FBCarry(
            zeta=zeta_new, zeta_bak=c.zeta, zeta_old=c.zeta_bak,
            ubar=ubar_new, ubar_bak=c.ubar, ubar_old=c.ubar_bak,
            vbar=vbar_new, vbar_bak=c.vbar, vbar_old=c.vbar_bak,
            rufrc=rufrc_c, rvfrc=rvfrc_c,
            ru0=ru0_new, rv0=rv0_new, avg=avg)

    def fast_loop(grid, zeta0, ubar0, vbar0, rufrc, rvfrc, rhoS, rhoA,
                  ru0_prev, rv0_prev, ru0_prev2, rv0_prev2, iic,
                  obc=None, sources=None, stokes2d=None):
        zeros = jnp.zeros_like(zeta0)
        avg0 = FastAverages(zeros, zeros, zeros, zeros, zeros)
        carry = FBCarry(
            zeta=zeta0, zeta_bak=zeta0, zeta_old=zeta0,
            ubar=ubar0, ubar_bak=ubar0, ubar_old=ubar0,
            vbar=vbar0, vbar_bak=vbar0, vbar_old=vbar0,
            rufrc=rufrc, rvfrc=rvfrc,
            ru0=ru0_prev, rv0=rv0_prev, avg=avg0)

        def body(c, iif):
            return substep(grid, iif, c, rhoS, rhoA, iic,
                           ru0_prev2, rv0_prev2, obc, sources,
                           stokes2d), None

        iifs = jnp.arange(1, nfast + 1, dtype=jnp.int32)
        carry, _ = lax.scan(body, carry, iifs)

        def _ring(f):
            if cfg.bc.ew_periodic:
                f = st.periodic_x(f)
            if cfg.bc.ns_periodic:
                f = st.periodic_y(f)
            return f

        avg = FastAverages(*[_ring(a) for a in carry.avg])
        return (avg, carry.ru0, carry.rv0,
                carry.zeta, carry.ubar, carry.vbar)

    return fast_loop
