"""Fast barotropic engine: LF-AM3 predictor/corrector with fast-time averaging.

Functional re-design of the reference's step2d kernel
(ROMS/Nonlinear/step2d_LF_AM3.h:163-3058) and the fast-loop index
orchestration of main3d (ROMS/Nonlinear/main3d.F:810-918).  The reference's
rotating slot indices kstp/krhs/knew/indx1 reduce to a fixed dataflow:

  predictor (fast step m, 1-based):
    krhs state = (zeta_m, ubar_m);  LF base = state at m-1 (or m when m==1)
    -> predicted state at ~m+1 stored as (zeta_p, ubar_p)
    rhs saved as history (rz_m, ru_m, rv_m)
  corrector:
    flux state = predicted;  AM3 base = state at m; rhs history (m, m-1)
    -> state at m+1

The whole fast loop is one `lax.scan` under jit — ndtfast*~1.6 iterations of
pure whole-array arithmetic, XLA-fused; the 2-per-fast-step halo exchanges
of the reference (step2d_LF_AM3.h:707-714,3041-3043) become ring refreshes
(single device) or GSPMD collective-permutes (sharded).

All scheme choices (advection C4/C2, viscosity on/off, VAR_RHO_2D) are
trace-time Python driven by the static ModelConfig.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .. import constants
from ..config import ModelConfig, PERIODIC, RADIATION
from ..grid.grid import Grid
from ..ops import stencil as st
from . import boundary, obc as obc_mod, wetdry as wd


class FastAverages(NamedTuple):
    """Fast-time averaged coupling fields (mod_coupling.F)."""
    Zt_avg1: jnp.ndarray
    DU_avg1: jnp.ndarray
    DV_avg1: jnp.ndarray
    DU_avg2: jnp.ndarray
    DV_avg2: jnp.ndarray


class FastCarry(NamedTuple):
    zeta: jnp.ndarray        # fast time m
    zeta_prev: jnp.ndarray   # fast time m-1
    ubar: jnp.ndarray
    ubar_prev: jnp.ndarray
    vbar: jnp.ndarray
    vbar_prev: jnp.ndarray
    rzeta_prev: jnp.ndarray  # predictor rhs history (fast step m-1)
    rubar_prev: jnp.ndarray
    rvbar_prev: jnp.ndarray
    rufrc: jnp.ndarray       # converted 2D<-3D coupling forcing
    rvfrc: jnp.ndarray
    ru0: jnp.ndarray         # rufrc history slot written at iif==1 (ru(:,:,0,nstp))
    rv0: jnp.ndarray
    avg: FastAverages


def _flux_state(cfg: ModelConfig, grid: Grid, zeta, ubar, vbar,
                sources=None, stokes2d=None):
    """Total depth and vertically integrated mass fluxes at the krhs state.

    step2d_LF_AM3.h:624-714: Drhs = zeta+h; DUon = ubar*0.5*(Drhs_i+Drhs_{i-1})*on_u.
    Ring refresh replaces the mp_exchange2d(DUon,DVom) halo update.
    """
    Drhs = zeta + grid.h
    DUon = ubar * st.avg_x(Drhs) * grid.on_u
    DVom = vbar * st.avg_y(Drhs) * grid.om_v
    if sources is not None and sources.qbar_u is not None:
        # LuvSrc: river mass flux through u/v faces (step2d LuvSrc
        # block); on land-masked faces add == the reference's set
        DUon = DUon + sources.qbar_u
        DVom = DVom + sources.qbar_v
    if stokes2d is not None:
        # WEC Lagrangian coupling: zeta advances with the total
        # (Eulerian + Stokes) transport (step2d WEC_VF DUSon terms)
        DUon = DUon + stokes2d[0]
        DVom = DVom + stokes2d[1]
    bc = cfg.bc
    if bc.ew_periodic:
        Drhs = st.periodic_x(Drhs)
        DUon = st.periodic_x(DUon)
        DVom = st.periodic_x(DVom)
    if bc.ns_periodic:
        Drhs = st.periodic_y(Drhs)
        DUon = st.periodic_y(DUon)
        DVom = st.periodic_y(DVom)
    if bc.volcons:
        # integral volume conservation (obc_volcons.F set_DUV_bc)
        DUon, DVom = obc_mod.obc_volcons(cfg, grid, zeta, ubar, vbar,
                                         Drhs, DUon, DVom)
    return Drhs, DUon, DVom


def _gzeta(cfg, rhoS, rhoA, zwrk, var_rho: bool):
    if cfg.sal_scalar:
        # scalar SAL: the gradient-driving elevation is (1-beta)*zeta
        zwrk = (1.0 - cfg.sal_scalar) * zwrk
    """Pressure-gradient free-surface factors (step2d_LF_AM3.h:905-983)."""
    if var_rho:
        fac = 1000.0 / cfg.rho0
        gzeta = (fac + rhoS) * zwrk
        gzeta2 = gzeta * zwrk
        gzetaSA = zwrk * (rhoS - rhoA)
    else:
        gzeta = zwrk
        gzeta2 = zwrk * zwrk
        gzetaSA = None
    return gzeta, gzeta2, gzetaSA


def _pg2d(cfg: ModelConfig, grid: Grid, gzeta, gzeta2, gzetaSA, zwrk,
          rhoA, var_rho: bool):
    """Barotropic pressure-gradient RHS terms (m4/s2,
    step2d_LF_AM3.h:1098-1211 / step2d_FB.h pressure section)."""
    g = cfg.g
    h = grid.h
    cff1 = 0.5 * g
    third = 1.0 / 3.0
    pg_u = (st.im1(h) + h) * (st.im1(gzeta) - gzeta) + \
           (st.im1(gzeta2) - gzeta2)
    pg_v = (st.jm1(h) + h) * (st.jm1(gzeta) - gzeta) + \
           (st.jm1(gzeta2) - gzeta2)
    if var_rho:
        pg_u = pg_u + (st.im1(h) - h) * (
            st.im1(gzetaSA) + gzetaSA
            + third * (st.im1(rhoA) - rhoA) * (st.im1(zwrk) - zwrk))
        pg_v = pg_v + (st.jm1(h) - h) * (
            st.jm1(gzetaSA) + gzetaSA
            + third * (st.jm1(rhoA) - rhoA) * (st.jm1(zwrk) - zwrk))
    return cff1 * grid.on_u * pg_u, cff1 * grid.om_v * pg_v


def _rhs2d_momentum(cfg: ModelConfig, grid: Grid, ubar, vbar,
                    Drhs, DUon, DVom, gzeta, gzeta2, gzetaSA, zwrk, rhoA,
                    var_rho: bool):
    """Full 2D momentum RHS at the krhs state (m4/s2 units).

    Pressure gradient: step2d_LF_AM3.h:1098-1211.
    C4 advection: :1268-1392.  Coriolis: :1425-1444.  Harmonic
    viscosity: :1562-1652.
    """
    g = cfg.g
    h = grid.h
    ewp = cfg.bc.ew_periodic
    nsp = cfg.bc.ns_periodic

    rhs_u, rhs_v = _pg2d(cfg, grid, gzeta, gzeta2, gzetaSA, zwrk,
                         rhoA, var_rho)

    # --- horizontal advection (4th-order centered, reference default) ---
    if cfg.uv_adv:
        sixth = 1.0 / 6.0
        # xi-flux of ubar at rho points
        gu = st.lap_x(ubar)             # ubar(i-1)-2u(i)+u(i+1) at U cols
        Dgu = st.lap_x(DUon)
        if ewp:
            gu = st.periodic_x(gu)
            Dgu = st.periodic_x(Dgu)
        else:
            # grad(Istr)=grad(Istr+1); grad(Iend+1)=grad(Iend)  (:1258-1273)
            gu = st.clamp_east(st.clamp_west(gu, col=2, at=1),
                               col=-2, at=-1)
            Dgu = st.clamp_east(st.clamp_west(Dgu, col=2, at=1),
                                col=-2, at=-1)
        UFx = 0.25 * (ubar + st.ip1(ubar) - sixth * (gu + st.ip1(gu))) * \
            (DUon + st.ip1(DUon) - sixth * (Dgu + st.ip1(Dgu)))

        # eta-flux of ubar at psi points
        gue = st.lap_y(ubar)
        if nsp:
            gue = st.periodic_y(gue)
        else:
            gue = st.clamp_north(st.clamp_south(gue, row=1), row=-2)
        DgDV = st.lap_x(DVom)
        if ewp:
            DgDV = st.periodic_x(DgDV)
        UFe = 0.25 * (ubar + st.jm1(ubar) - sixth * (gue + st.jm1(gue))) * \
            (DVom + st.im1(DVom) - sixth * (DgDV + st.im1(DgDV)))

        # xi-flux of vbar at psi points
        gv = st.lap_x(vbar)
        if ewp:
            gv = st.periodic_x(gv)
        else:
            gv = st.clamp_east(st.clamp_west(gv, col=1, at=0),
                               col=-2, at=-1)
        DgDU = st.lap_y(DUon)
        if nsp:
            DgDU = st.periodic_y(DgDU)
        VFx = 0.25 * (vbar + st.im1(vbar) - sixth * (gv + st.im1(gv))) * \
            (DUon + st.jm1(DUon) - sixth * (DgDU + st.jm1(DgDU)))

        # eta-flux of vbar at rho points
        gve = st.lap_y(vbar)
        Dgve = st.lap_y(DVom)
        if nsp:
            gve = st.periodic_y(gve)
            Dgve = st.periodic_y(Dgve)
        else:
            gve = st.clamp_north(st.clamp_south(gve, row=2, at=1),
                                 row=-2)
            Dgve = st.clamp_north(st.clamp_south(Dgve, row=2, at=1),
                                  row=-2)
        VFe = 0.25 * (vbar + st.jp1(vbar) - sixth * (gve + st.jp1(gve))) * \
            (DVom + st.jp1(DVom) - sixth * (Dgve + st.jp1(Dgve)))

        rhs_u = rhs_u - (UFx - st.im1(UFx)) - (st.jp1(UFe) - UFe)
        rhs_v = rhs_v - (st.ip1(VFx) - VFx) - (VFe - st.jm1(VFe))

    # --- Coriolis ---------------------------------------------------------
    if cfg.uv_cor:
        cffc = 0.5 * Drhs * grid.fomn
        UFxc = cffc * (vbar + st.jp1(vbar))
        VFec = cffc * (ubar + st.ip1(ubar))
        if ewp:
            UFxc = st.periodic_x(UFxc)
            VFec = st.periodic_x(VFec)
        if nsp:
            UFxc = st.periodic_y(UFxc)
            VFec = st.periodic_y(VFec)
        rhs_u = rhs_u + 0.5 * (UFxc + st.im1(UFxc))
        rhs_v = rhs_v - 0.5 * (VFec + st.jm1(VFec))

    # --- curvilinear metric terms (step2d_LF_AM3.h:1505-1558) -------------
    if cfg.curvgrid and cfg.uv_adv:
        cff1_ = 0.5 * (vbar + st.jp1(vbar))
        cff2_ = 0.5 * (ubar + st.ip1(ubar))
        cffm = Drhs * (cff1_ * grid.dndx - cff2_ * grid.dmde)
        UFxm = cffm * cff1_
        VFem = cffm * cff2_
        if ewp:
            UFxm = st.periodic_x(UFxm)
            VFem = st.periodic_x(VFem)
        if nsp:
            UFxm = st.periodic_y(UFxm)
            VFem = st.periodic_y(VFem)
        rhs_u = rhs_u + 0.5 * (UFxm + st.im1(UFxm))
        rhs_v = rhs_v - 0.5 * (VFem + st.jm1(VFem))

    # --- harmonic viscosity ------------------------------------------------
    if cfg.mixing.visc2 > 0.0:
        Drhs_p = 0.25 * (Drhs + st.im1(Drhs) + st.jm1(Drhs)
                         + st.im1jm1(Drhs))
        pn, pm = grid.pn, grid.pm
        upn = pn + st.im1(pn)       # (pn(i-1)+pn(i)) at u col i
        vpm = pm + st.jm1(pm)
        cff_r = grid.visc2_r * Drhs * 0.5 * (
            grid.pmon_r * st.dx_p(upn * ubar)
            - grid.pnom_r * st.dy_p(vpm * vbar))
        if ewp:
            cff_r = st.periodic_x(cff_r)
        if nsp:
            cff_r = st.periodic_y(cff_r)
        UFxv = grid.on_r * grid.on_r * cff_r
        VFev = grid.om_r * grid.om_r * cff_r

        vpn = pn + st.jm1(pn)       # (pn(i,j-1)+pn(i,j)) at v row j
        upm = pm + st.im1(pm)
        cff_p = grid.visc2_p * Drhs_p * 0.5 * (
            grid.pmon_p * st.dx_m(vpn * vbar)
            + grid.pnom_p * st.dy_m(upm * ubar)) * grid.pmask
        if ewp:
            cff_p = st.periodic_x(cff_p)
        if nsp:
            cff_p = st.periodic_y(cff_p)
        UFev = grid.om_p * grid.om_p * cff_p
        VFxv = grid.on_p * grid.on_p * cff_p

        rhs_u = rhs_u + 0.5 * upn * st.dx_m(UFxv) \
            + 0.5 * upm * (st.jp1(UFev) - UFev)
        rhs_v = rhs_v + 0.5 * vpn * (st.ip1(VFxv) - VFxv) \
            - 0.5 * vpm * st.dy_m(VFev)

    return rhs_u, rhs_v


def _zeta_bc(cfg, f, grid=None, z_old=None, dt2d=None, obc=None):
    f = boundary.bc_rho(f, cfg.bc.zeta, (obc or {}).get("zeta"))
    if z_old is not None and _has_open(cfg.bc.zeta):
        f = obc_mod.zetabc(cfg, grid, f, z_old, dt2d, obc)
    return f


def _has_open(lbc):
    from ..config import (CHAPMAN_EXPLICIT, CHAPMAN_IMPLICIT, CLAMPED,
                          FLATHER, RADIATION, SHCHEPETKIN)
    kinds = (CHAPMAN_EXPLICIT, CHAPMAN_IMPLICIT, CLAMPED, FLATHER,
             RADIATION, SHCHEPETKIN)
    return any(getattr(lbc, s) in kinds
               for s in ("west", "south", "east", "north"))


def _uv_bc(cfg, grid, u, v, z_old=None, ub_old=None, vb_old=None,
           obc=None, z_new=None, dt2d=None, red_stress=None):
    from ..config import REDUCED
    bd = obc or {}
    u = boundary.bc_u(u, cfg.bc.ubar, cfg.gamma2, bd.get("ubar"))
    v = boundary.bc_v(v, cfg.bc.vbar, cfg.gamma2, bd.get("vbar"))
    if z_old is not None and (
            REDUCED in (cfg.bc.ubar.west, cfg.bc.ubar.east)
            or REDUCED in (cfg.bc.vbar.south, cfg.bc.vbar.north)):
        u, v = obc_mod.u2dbc_reduced(cfg, grid, u, v, ub_old, vb_old,
                                     z_old, dt2d, obc, red_stress)
    if ub_old is not None and RADIATION in (
            cfg.bc.ubar.west, cfg.bc.ubar.east, cfg.bc.ubar.south,
            cfg.bc.ubar.north, cfg.bc.vbar.west, cfg.bc.vbar.east,
            cfg.bc.vbar.south, cfg.bc.vbar.north):
        # u2dbc_im.F/v2dbc_im.F radiation branches with M2obc_in/out
        # nudging on LBC.nudge edges
        m2in = cfg.nudg.obcfac * cfg.nudg.m2nudg
        u = obc_mod.radiation_3d(cfg, cfg.bc.ubar, u, ub_old, dt=dt2d,
                                 data=bd.get("ubar"), stagger="u",
                                 tau_in=m2in, tau_out=cfg.nudg.m2nudg)
        v = obc_mod.radiation_3d(cfg, cfg.bc.vbar, v, vb_old, dt=dt2d,
                                 data=bd.get("vbar"), stagger="v",
                                 tau_in=m2in, tau_out=cfg.nudg.m2nudg)
    if z_old is not None and (_has_open(cfg.bc.ubar)
                              or _has_open(cfg.bc.vbar)):
        u, v = obc_mod.u2dbc_flather(cfg, grid, u, v, z_old, ub_old,
                                     vb_old, obc, dt2d=dt2d)
        from ..config import SHCHEPETKIN
        sides = [getattr(cfg.bc.ubar, s) for s in
                 ("west", "east")] + \
                [getattr(cfg.bc.vbar, s) for s in ("south", "north")]
        if SHCHEPETKIN in sides and z_new is not None:
            u, v = obc_mod.u2dbc_shchepetkin(
                cfg, grid, u, v, z_new, z_old, ub_old, vb_old,
                dt2d, obc)
    return u, v


def make_substep_kernels(cfg: ModelConfig, nfast: int, w1j, w2j,
                         var_rho: bool = True):
    """LF-AM3 predictor/corrector/aux kernels for one fast substep.

    Shared by the single-program lax.scan engine (make_fast_loop below)
    and the sharded widened-halo engine (parallel.fastloop), which runs
    the same kernels per shard-block inside shard_map with explicit
    ppermute halo refreshes between substeps — the mp_exchange.F:520-773
    discipline.  Returns (predictor, corrector, aux_pass, init_carry).
    """
    dtfast = cfg.dt / cfg.ndtfast

    def init_carry(zeta0, ubar0, vbar0, rufrc, rvfrc, ru0_prev,
                   rv0_prev):
        zeros = jnp.zeros_like(zeta0)
        avg0 = FastAverages(zeros, zeros, zeros, zeros, zeros)
        return FastCarry(
            zeta=zeta0, zeta_prev=zeta0,
            ubar=ubar0, ubar_prev=ubar0,
            vbar=vbar0, vbar_prev=vbar0,
            rzeta_prev=zeros, rubar_prev=zeros, rvbar_prev=zeros,
            rufrc=rufrc, rvfrc=rvfrc,
            ru0=ru0_prev, rv0=rv0_prev, avg=avg0)

    def predictor(grid, iif, c: FastCarry, rhoS, rhoA, iic,
                  ru0_prev2, rv0_prev2, obc, sources=None,
                  stokes2d=None):
        pmn = grid.pm * grid.pn
        pmn4_u = (grid.pm + st.im1(grid.pm)) * (grid.pn + st.im1(grid.pn))
        pmn4_v = (grid.pm + st.jm1(grid.pm)) * (grid.pn + st.jm1(grid.pn))
        """iif is the 1-based fast-step index (traced)."""
        first = (iif == 1)
        Drhs, DUon, DVom = _flux_state(cfg, grid, c.zeta, c.ubar,
                                       c.vbar, sources, stokes2d)

        # ---- fast-time averaging, predictor branch (:742-800) ----
        cffA1 = jnp.where(first, 0.0, w1j[jnp.maximum(iif - 2, 0)])
        cffA2 = jnp.where(first,
                          (-1.0 / 12.0) * w2j[iif],
                          (8.0 / 12.0) * w2j[iif - 1]
                          - (1.0 / 12.0) * w2j[iif])
        avg = c.avg
        Zt = jnp.where(first, 0.0, avg.Zt_avg1) + cffA1 * c.zeta
        DU1 = jnp.where(first, 0.0, avg.DU_avg1) + cffA1 * DUon
        DV1 = jnp.where(first, 0.0, avg.DV_avg1) + cffA1 * DVom
        DU2 = jnp.where(first, 0.0, avg.DU_avg2) + cffA2 * DUon
        DV2 = jnp.where(first, 0.0, avg.DV_avg2) + cffA2 * DVom
        avg = FastAverages(Zt, DU1, DV1, DU2, DV2)

        # ---- free surface (FE first step / LF after) ----
        rhs_zeta = (DUon - st.ip1(DUon)) + (DVom - st.jp1(DVom))
        zeta_fe = c.zeta + pmn * dtfast * rhs_zeta
        zeta_lf = c.zeta_prev + pmn * (2.0 * dtfast) * rhs_zeta
        zeta_new = jnp.where(first, zeta_fe, zeta_lf) * grid.rmask
        if sources is not None:
            # LwSrc vertical volume influx (step2d_LF_AM3.h:1020-1036)
            zeta_new = zeta_new + sources.qbar * pmn * dtfast
        if cfg.wetdry:
            zeta_new = wd.clamp_dry_zeta(cfg, grid, zeta_new)
        cff4 = 4.0 / 25.0
        cff5 = 1.0 - 2.0 * cff4
        zwrk = jnp.where(first,
                         0.5 * (c.zeta + zeta_fe),
                         cff5 * c.zeta + cff4 * (c.zeta_prev + zeta_lf))
        gz, gz2, gzSA = _gzeta(cfg, rhoS, rhoA, zwrk, var_rho)
        dt2d_p = jnp.where(first, dtfast, 2.0 * dtfast)
        zeta_new = _zeta_bc(cfg, zeta_new, grid, c.zeta, dt2d_p, obc)
        Dnew = zeta_new + grid.h

        # ---- momentum rhs at krhs = fast time m ----
        rhs_u, rhs_v = _rhs2d_momentum(cfg, grid, c.ubar, c.vbar, Drhs,
                                       DUon, DVom, gz, gz2, gzSA, zwrk,
                                       rhoA, var_rho)

        # ---- 2D/3D coupling: convert rufrc on the first fast step ----
        # (step2d_LF_AM3.h:2190-2425)
        rufrc_c = jnp.where(first, c.rufrc - rhs_u, c.rufrc)
        rvfrc_c = jnp.where(first, c.rvfrc - rhs_v, c.rvfrc)
        # AB3 extrapolation coefficients keyed on baroclinic step count
        a1 = jnp.where(iic == 0, 1.0,
                       jnp.where(iic == 1, 1.5, 23.0 / 12.0))
        a2 = jnp.where(iic == 0, 0.0,
                       jnp.where(iic == 1, 0.5, 16.0 / 12.0))
        a3 = jnp.where(iic <= 1, 0.0, 5.0 / 12.0)
        forcing_first = a1 * rufrc_c - a2 * c.ru0 + a3 * ru0_prev2
        forcing_first_v = a1 * rvfrc_c - a2 * c.rv0 + a3 * rv0_prev2
        rhs_u = rhs_u + jnp.where(first, forcing_first, rufrc_c)
        rhs_v = rhs_v + jnp.where(first, forcing_first_v, rvfrc_c)

        # ---- momentum predictor update ----
        Dstp_fe = c.zeta + grid.h          # kstp = m when first
        Dstp_lf = c.zeta_prev + grid.h     # kstp = m-1 for LF
        cffdt = jnp.where(first, 0.5 * dtfast, dtfast)
        ub_base = jnp.where(first, c.ubar, c.ubar_prev)
        vb_base = jnp.where(first, c.vbar, c.vbar_prev)
        Dstp = jnp.where(first, Dstp_fe, Dstp_lf)
        Du_stp = Dstp + st.im1(Dstp)
        Dv_stp = Dstp + st.jm1(Dstp)
        Du_new = Dnew + st.im1(Dnew)
        Dv_new = Dnew + st.jm1(Dnew)
        ubar_new = (ub_base * Du_stp + pmn4_u * cffdt * rhs_u) / Du_new
        vbar_new = (vb_base * Dv_stp + pmn4_v * cffdt * rhs_v) / Dv_new
        ubar_new = ubar_new * grid.umask
        vbar_new = vbar_new * grid.vmask
        if cfg.wetdry:
            # draining-only flow through part-dry faces
            # (step2d_LF_AM3.h:2471-2486)
            wm = wd.compute_wet_masks(cfg, grid, zeta_new)
            ubar_new = wd.mask_momentum(ubar_new, wm.umask_wet)
            vbar_new = wd.mask_momentum(vbar_new, wm.vmask_wet)
        ubar_new, vbar_new = _uv_bc(cfg, grid, ubar_new, vbar_new,
                                    c.zeta, c.ubar, c.vbar, obc,
                                    z_new=zeta_new, dt2d=dtfast)

        return (zeta_new, ubar_new, vbar_new, rhs_zeta, rhs_u, rhs_v,
                rufrc_c, rvfrc_c, avg)

    def corrector(grid, iif, c: FastCarry, zeta_p, ubar_p, vbar_p,
                  rz_m, ru_m, rv_m, rufrc_c, rvfrc_c, rhoS, rhoA, obc,
                  sources=None, stokes2d=None):
        pmn = grid.pm * grid.pn
        pmn4_u = (grid.pm + st.im1(grid.pm)) * (grid.pn + st.im1(grid.pn))
        pmn4_v = (grid.pm + st.jm1(grid.pm)) * (grid.pn + st.jm1(grid.pn))
        first = (iif == 1)
        avg = c.avg
        Drhs, DUon, DVom = _flux_state(cfg, grid, zeta_p, ubar_p,
                                       vbar_p, sources, stokes2d)

        # fast-averaging corrector branch (:795-806)
        cffA2 = jnp.where(first, w2j[iif - 1], (5.0 / 12.0) * w2j[iif - 1])
        avg = avg._replace(DU_avg2=avg.DU_avg2 + cffA2 * DUon,
                           DV_avg2=avg.DV_avg2 + cffA2 * DVom)

        # free surface: BE first step / AM3 after (:903-983)
        div = (DUon - st.ip1(DUon)) + (DVom - st.jp1(DVom))
        zeta_be = c.zeta + pmn * dtfast * div
        zeta_am3 = c.zeta + pmn * ((5.0 / 12.0) * dtfast * div
                                   + (8.0 / 12.0) * dtfast * rz_m
                                   - (1.0 / 12.0) * dtfast * c.rzeta_prev)
        zeta_new = jnp.where(first, zeta_be, zeta_am3) * grid.rmask
        if sources is not None:
            zeta_new = zeta_new + sources.qbar * pmn * dtfast
        if cfg.wetdry:
            zeta_new = wd.clamp_dry_zeta(cfg, grid, zeta_new)
        cff4 = 2.0 / 5.0
        cff5 = 1.0 - cff4
        zwrk = jnp.where(first,
                         0.5 * (c.zeta + zeta_be),
                         cff5 * zeta_am3 + cff4 * zeta_p)
        gz, gz2, gzSA = _gzeta(cfg, rhoS, rhoA, zwrk, var_rho)
        zeta_new = _zeta_bc(cfg, zeta_new, grid, c.zeta, dtfast, obc)
        Dnew = zeta_new + grid.h

        # momentum rhs at krhs = predicted state
        rhs_u, rhs_v = _rhs2d_momentum(cfg, grid, ubar_p, vbar_p, Drhs,
                                       DUon, DVom, gz, gz2, gzSA, zwrk,
                                       rhoA, var_rho)
        rhs_u = rhs_u + rufrc_c
        rhs_v = rhs_v + rvfrc_c

        # momentum corrector: BE first / AM3 after (:2528-2642)
        Dstp = c.zeta + grid.h      # kstp = fast time m
        Du_stp = Dstp + st.im1(Dstp)
        Dv_stp = Dstp + st.jm1(Dstp)
        Du_new = Dnew + st.im1(Dnew)
        Dv_new = Dnew + st.jm1(Dnew)
        half = 0.5 * dtfast
        rhs_u_t = jnp.where(first, half * rhs_u,
                            half * ((5.0 / 12.0) * rhs_u
                                    + (8.0 / 12.0) * ru_m
                                    - (1.0 / 12.0) * c.rubar_prev))
        rhs_v_t = jnp.where(first, half * rhs_v,
                            half * ((5.0 / 12.0) * rhs_v
                                    + (8.0 / 12.0) * rv_m
                                    - (1.0 / 12.0) * c.rvbar_prev))
        ubar_new = (c.ubar * Du_stp + pmn4_u * rhs_u_t) / Du_new
        vbar_new = (c.vbar * Dv_stp + pmn4_v * rhs_v_t) / Dv_new
        ubar_new = ubar_new * grid.umask
        vbar_new = vbar_new * grid.vmask
        if cfg.wetdry:
            wm = wd.compute_wet_masks(cfg, grid, zeta_new)
            ubar_new = wd.mask_momentum(ubar_new, wm.umask_wet)
            vbar_new = wd.mask_momentum(vbar_new, wm.vmask_wet)
        ubar_new, vbar_new = _uv_bc(cfg, grid, ubar_new, vbar_new,
                                    c.zeta, c.ubar, c.vbar, obc,
                                    z_new=zeta_new, dt2d=dtfast)

        return FastCarry(
            zeta=zeta_new, zeta_prev=c.zeta,
            ubar=ubar_new, ubar_prev=c.ubar,
            vbar=vbar_new, vbar_prev=c.vbar,
            rzeta_prev=rz_m, rubar_prev=ru_m, rvbar_prev=rv_m,
            rufrc=rufrc_c, rvfrc=rvfrc_c,
            ru0=c.ru0, rv0=c.rv0, avg=avg)

    def _aux_pass(grid, carry, sources, stokes2d):

        # Auxiliary (nfast+1) predictor pass: final accumulation only
        # (step2d_LF_AM3.h:821-860 + RETURN before time stepping).
        _, DUon, DVom = _flux_state(cfg, grid, carry.zeta, carry.ubar,
                                    carry.vbar, sources, stokes2d)
        cffA1 = w1j[nfast - 1]
        cffA2 = (8.0 / 12.0) * w2j[nfast] - (1.0 / 12.0) * w2j[nfast + 1]
        avg = carry.avg
        # Reference only refreshes ghosts (exchange_*2d + mp_exchange2d,
        # step2d_LF_AM3.h:821-860), no physical BC is applied to averages.
        def _ring(f):
            if cfg.bc.ew_periodic:
                f = st.periodic_x(f)
            if cfg.bc.ns_periodic:
                f = st.periodic_y(f)
            return f
        avg = FastAverages(
            Zt_avg1=_ring(avg.Zt_avg1 + cffA1 * carry.zeta),
            DU_avg1=_ring(avg.DU_avg1 + cffA1 * DUon),
            DV_avg1=_ring(avg.DV_avg1 + cffA1 * DVom),
            DU_avg2=_ring(avg.DU_avg2 + cffA2 * DUon),
            DV_avg2=_ring(avg.DV_avg2 + cffA2 * DVom))

        return (avg, carry.rufrc, carry.rvfrc,
                carry.zeta, carry.ubar, carry.vbar)

    return predictor, corrector, _aux_pass, init_carry


def make_fast_loop(cfg: ModelConfig, nfast: int, w1, w2,
                   var_rho: bool = True):
    """Build the jittable fast barotropic loop.

    Args:
      nfast, w1, w2: from roms_tpu.core.weights.power_law_weights (w1/w2
        0-based numpy arrays; weight(1,i) of the reference is w1[i-1]).
      var_rho: include VAR_RHO_2D density terms in the 2D pressure gradient.

    Returns fast_loop(zeta0, ubar0, vbar0, rufrc, rvfrc, rhoS, rhoA,
                      ru0_prev, rv0_prev, iic)
      -> (FastAverages, rufrc_eff, rvfrc_eff, zeta_fin, ubar_fin, vbar_fin)

    ru0_prev/rv0_prev: rufrc history of the previous baroclinic step
    (reference ru(:,:,0,nnew)); rufrc AB3 extrapolation per
    step2d_LF_AM3.h:2190-2425. ru0_prev2 is the two-steps-back history
    (ru(:,:,0,nstp) before overwrite).
    """
    dtype = jnp.dtype(cfg.dtype)
    w1j = jnp.asarray(w1, dtype)
    w2j = jnp.asarray(w2, dtype)
    predictor, corrector, _aux_pass, init_carry = make_substep_kernels(
        cfg, nfast, w1j, w2j, var_rho)

    def fast_loop(grid, zeta0, ubar0, vbar0, rufrc, rvfrc, rhoS, rhoA,
                  ru0_prev, rv0_prev, ru0_prev2, rv0_prev2, iic,
                  obc=None, sources=None, stokes2d=None):
        from ..ops import pallas_step2d as p2d
        use_res = p2d.use_pallas_fastloop_res(cfg, zeta0.shape)
        if (obc in (None, {}) and sources is None and stokes2d is None
                and (use_res or p2d.use_pallas_step2d(cfg))):
            # fused Pallas engine: VMEM-resident whole-grid loop (all
            # substeps in ONE kernel) when it fits, else the j-blocked
            # per-substep kernel (ops/pallas_step2d.py)
            engine = (p2d.fast_loop_pallas_res if use_res
                      else p2d.fast_loop_pallas)
            pc = engine(
                cfg, grid, nfast, w1j, w2j, var_rho,
                zeta0, ubar0, vbar0, rufrc, rvfrc, rhoS, rhoA,
                ru0_prev, rv0_prev, ru0_prev2, rv0_prev2, iic)
            carry = FastCarry(
                zeta=pc["zeta"], zeta_prev=pc["zeta_prev"],
                ubar=pc["ubar"], ubar_prev=pc["ubar_prev"],
                vbar=pc["vbar"], vbar_prev=pc["vbar_prev"],
                rzeta_prev=pc["rzeta_prev"],
                rubar_prev=pc["rubar_prev"],
                rvbar_prev=pc["rvbar_prev"],
                rufrc=pc["rufrc"], rvfrc=pc["rvfrc"],
                ru0=ru0_prev, rv0=rv0_prev,
                avg=FastAverages(pc["Zt"], pc["DU1"], pc["DV1"],
                                 pc["DU2"], pc["DV2"]))
            return _aux_pass(grid, carry, sources, stokes2d)

        zeros = jnp.zeros_like(zeta0)
        avg0 = FastAverages(zeros, zeros, zeros, zeros, zeros)
        carry = FastCarry(
            zeta=zeta0, zeta_prev=zeta0,
            ubar=ubar0, ubar_prev=ubar0,
            vbar=vbar0, vbar_prev=vbar0,
            rzeta_prev=zeros, rubar_prev=zeros, rvbar_prev=zeros,
            rufrc=rufrc, rvfrc=rvfrc,
            ru0=ru0_prev, rv0=rv0_prev, avg=avg0)

        def body(c, iif):
            (zeta_p, ubar_p, vbar_p, rz_m, ru_m, rv_m,
             rufrc_c, rvfrc_c, avg) = predictor(grid, iif, c, rhoS, rhoA,
                                                iic, ru0_prev2, rv0_prev2,
                                                obc, sources, stokes2d)
            c = c._replace(avg=avg)
            c = corrector(grid, iif, c, zeta_p, ubar_p, vbar_p,
                          rz_m, ru_m, rv_m, rufrc_c, rvfrc_c, rhoS, rhoA,
                          obc, sources, stokes2d)
            return c, None

        iifs = jnp.arange(1, nfast + 1, dtype=jnp.int32)
        carry, _ = lax.scan(body, carry, iifs)
        return _aux_pass(grid, carry, sources, stokes2d)

    return fast_loop
