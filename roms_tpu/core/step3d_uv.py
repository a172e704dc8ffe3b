"""Corrector for 3D momentum with implicit vertical viscosity and
barotropic coupling.

Re-implements ROMS/Nonlinear/step3d_uv.F: add the AB3 lead term of the
new RHS, solve the backward-implicit vertical viscosity (spline or
standard tridiagonal along k, batched over the whole horizontal plane),
replace the (inaccurate) vertical mean with the fast-time-averaged
barotropic transport DU_avg1, and rebuild time-centered mass fluxes
Huon/Hvom consistent with DU_avg2 for the tracer corrector.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st
from ..ops.tridiag import implicit_vdiff_solve, spline_flux_solve
from . import boundary, obc as obc_mod


def step3d_uv(cfg: ModelConfig, grid: Grid, u_part, v_part, ru, rv,
              Hz, z_r, Akv, avg, Huon_old, Hvom_old, iic,
              u_old=None, v_old=None, obc=None, Wi=None,
              collect_diag: bool = False):
    """Returns (u, v, ubar, vbar, Huon, Hvom) at time n+1.

    u_part/v_part: corrector seeds from pre_step3d (+uv3dmix), Hz*u units.
    ru/rv: full 3D RHS at time n.  Hz/z_r: NEW depths (from Zt_avg1).
    avg: FastAverages.  Huon_old/Hvom_old: mass fluxes at time n.

    collect_diag=True additionally returns the DIAGNOSTICS_UV stage
    increments in Hz*u units (set_diags.F momentum budget): vvisc =
    implicit-solve + new-depth increment, cpl = barotropic-coupling +
    BC increment, and the AB3 lead scale DC0 for converting the RHS
    term decomposition."""
    dt = cfg.dt
    # AB3 lead coefficient (step3d_uv.F:261-268)
    cffab = jnp.where(iic == 0, 0.25 * dt,
                      jnp.where(iic == 1, 0.25 * dt * 1.5,
                                0.25 * dt * 23.0 / 12.0))

    from ..ops import pallas_uv
    if pallas_uv.use_pallas_uv(cfg) and not collect_diag:
        return _step3d_uv_pallas(cfg, grid, u_part, v_part, ru, rv,
                                 Hz, Akv, cffab, avg, Huon_old,
                                 Hvom_old, u_old, v_old, obc)

    DC0u = cffab * (grid.pm + st.im1(grid.pm)) * \
        (grid.pn + st.im1(grid.pn))
    DC0v = cffab * (grid.pm + st.jm1(grid.pm)) * \
        (grid.pn + st.jm1(grid.pn))

    Hz_u = 0.5 * (Hz + st.im1(Hz))
    Hz_v = 0.5 * (Hz + st.jm1(Hz))
    AKu = 0.5 * (Akv + st.im1(Akv))
    AKv_ = 0.5 * (Akv + st.jm1(Akv))

    un = u_part + DC0u * ru
    vn = v_part + DC0v * rv
    if collect_diag:
        un_pre = un
        vn_pre = vn

    if cfg.mixing.splines_vvisc:
        # SPLINES_VVISC (step3d_uv.F:292-339); the u and v systems are
        # independent columns, so they batch along a NEW axis after k
        # into ONE solve (half the sequential-scan latency).  A new
        # axis — NOT a j-concat, which would cross the (eta, xi) mesh
        # sharding and break shard invariance.
        un = un / Hz_u
        vn = vn / Hz_v
        Hz_s = jnp.stack([Hz_u, Hz_v], axis=1)
        AK_s = jnp.stack([AKu, AKv_], axis=1)
        q_s = jnp.stack([un, vn], axis=1)
        sol = spline_flux_solve(Hz_s, AK_s, q_s, dt)
        un = un + sol[:, 0]
        vn = vn + sol[:, 1]
    else:
        # standard backward-implicit tridiagonal (step3d_uv.F:341-420)
        dz_u = (z_r[1:] + st.im1(z_r[1:])) - (z_r[:-1] + st.im1(z_r[:-1]))
        dz_v = (z_r[1:] + st.jm1(z_r[1:])) - (z_r[:-1] + st.jm1(z_r[:-1]))
        un = implicit_vdiff_solve(Hz_u, 2.0 * AKu, 1.0 / dz_u, un, dt)
        vn = implicit_vdiff_solve(Hz_v, 2.0 * AKv_, 1.0 / dz_v, vn, dt)

    if Wi is not None:
        # adaptive implicit vertical advection (step3d_uv.F:507-600):
        # upwind solve with the implicit remainder Wi averaged to
        # momentum points, after the viscosity solve.
        from ..ops.tridiag import implicit_adv_solve
        pmn_u = ((grid.pm + st.im1(grid.pm)) *
                 (grid.pn + st.im1(grid.pn)))[None] * 0.25
        pmn_v = ((grid.pm + st.jm1(grid.pm)) *
                 (grid.pn + st.jm1(grid.pn)))[None] * 0.25
        FCu = dt * pmn_u * 0.5 * (Wi + st.im1(Wi))
        FCv = dt * pmn_v * 0.5 * (Wi + st.jm1(Wi))
        un = implicit_adv_solve(Hz_u, FCu, un * Hz_u)
        vn = implicit_adv_solve(Hz_v, FCv, vn * Hz_v)

    # ---- couple to barotropic mode (step3d_uv.F:595-700) ----------------
    D_u = jnp.sum(Hz_u, axis=0)
    D_v = jnp.sum(Hz_v, axis=0)

    def correct_u(q):
        err = (jnp.sum(q * Hz_u, axis=0) * grid.on_u - avg.DU_avg1) / \
            (D_u * grid.on_u)
        return (q - err[None]) * grid.umask

    def correct_v(q):
        err = (jnp.sum(q * Hz_v, axis=0) * grid.om_v - avg.DV_avg1) / \
            (D_v * grid.om_v)
        return (q - err[None]) * grid.vmask

    if collect_diag:
        dia_uv = {"vvisc_u": Hz_u * un - un_pre,
                  "vvisc_v": Hz_v * vn - vn_pre,
                  "un_solved": un, "vn_solved": vn,
                  "DC0u": DC0u, "DC0v": DC0v,
                  "Hz_u": Hz_u, "Hz_v": Hz_v}
    un = correct_u(un)
    vn = correct_v(vn)
    un = boundary.bc_u(un, cfg.bc.u, cfg.gamma2,
                       bdata=(obc or {}).get("u"))
    vn = boundary.bc_v(vn, cfg.bc.v, cfg.gamma2,
                       bdata=(obc or {}).get("v"))
    if u_old is not None:
        m3in = cfg.nudg.obcfac * cfg.nudg.m3nudg
        un = obc_mod.radiation_3d(cfg, cfg.bc.u, un, u_old, dt=cfg.dt,
                                  data=(obc or {}).get("u"), stagger="u",
                                  tau_in=m3in, tau_out=cfg.nudg.m3nudg)
        vn = obc_mod.radiation_3d(cfg, cfg.bc.v, vn, v_old, dt=cfg.dt,
                                  data=(obc or {}).get("v"), stagger="v",
                                  tau_in=m3in, tau_out=cfg.nudg.m3nudg)
    # Re-correct so BOUNDARY points also carry the exact barotropic mean
    # (interior is already exact; step3d_uv.F:1390-1470).
    un = correct_u(un)
    vn = correct_v(vn)
    # The reference halo-exchanges AFTER this correction
    # (step3d_uv.F:1766-1783); the correction uses the roll-artifact
    # Hz_u at the west ghost column, so re-wrap the periodic ring or
    # the ghost goes stale (caught by the sharded-engine equality test
    # with a zonally-varying Pair field).
    if cfg.bc.ew_periodic:
        un, vn = st.periodic_x(un), st.periodic_x(vn)
    if cfg.bc.ns_periodic:
        un, vn = st.periodic_y(un), st.periodic_y(vn)

    ubar = avg.DU_avg1 / (D_u * grid.on_u) * grid.umask
    vbar = avg.DV_avg1 / (D_v * grid.om_v) * grid.vmask
    ubar = boundary.bc_u(ubar, cfg.bc.ubar, cfg.gamma2,
                         bdata=(obc or {}).get("ubar"))
    vbar = boundary.bc_v(vbar, cfg.bc.vbar, cfg.gamma2,
                         bdata=(obc or {}).get("vbar"))

    # ---- time-centered mass fluxes consistent with DU_avg2 --------------
    # (step3d_uv.F:1500-1560,1700-1716)
    DCk_u = Hz_u * grid.on_u
    DCk_v = Hz_v * grid.om_v
    Huon = 0.5 * (Huon_old + un * DCk_u)
    Hvom = 0.5 * (Hvom_old + vn * DCk_v)
    errU = (jnp.sum(Huon, axis=0) - avg.DU_avg2) / (D_u * grid.on_u)
    errV = (jnp.sum(Hvom, axis=0) - avg.DV_avg2) / (D_v * grid.om_v)
    Huon = Huon - DCk_u * errU[None]
    Hvom = Hvom - DCk_v * errV[None]
    if cfg.bc.ew_periodic:
        Huon = st.periodic_x(Huon)
        Hvom = st.periodic_x(Hvom)
    if cfg.bc.ns_periodic:
        Huon = st.periodic_y(Huon)
        Hvom = st.periodic_y(Hvom)

    if collect_diag:
        dia_uv["cpl_u"] = dia_uv["Hz_u"] * (un - dia_uv.pop("un_solved"))
        dia_uv["cpl_v"] = dia_uv["Hz_v"] * (vn - dia_uv.pop("vn_solved"))
        return un, vn, ubar, vbar, Huon, Hvom, dia_uv
    return un, vn, ubar, vbar, Huon, Hvom


def _step3d_uv_pallas(cfg, grid, u_part, v_part, ru, rv, Hz, Akv,
                      cffab, avg, Huon_old, Hvom_old, u_old, v_old,
                      obc):
    """Fused-kernel path: solve kernel -> jnp BCs -> finish kernel
    (ops/pallas_uv.py); numerics match the jnp path to reduction-order
    ulps (tests/test_pallas_uv.py)."""
    from ..ops import pallas_uv
    interp = pallas_uv._interp()
    un, vn = pallas_uv.uv_solve_pallas(
        cfg, grid, u_part, v_part, ru, rv, Hz, Akv, cffab,
        avg.DU_avg1, avg.DV_avg1, interpret=interp)
    un = boundary.bc_u(un, cfg.bc.u, cfg.gamma2,
                       bdata=(obc or {}).get("u"))
    vn = boundary.bc_v(vn, cfg.bc.v, cfg.gamma2,
                       bdata=(obc or {}).get("v"))
    if u_old is not None:
        m3in = cfg.nudg.obcfac * cfg.nudg.m3nudg
        un = obc_mod.radiation_3d(cfg, cfg.bc.u, un, u_old, dt=cfg.dt,
                                  data=(obc or {}).get("u"), stagger="u",
                                  tau_in=m3in, tau_out=cfg.nudg.m3nudg)
        vn = obc_mod.radiation_3d(cfg, cfg.bc.v, vn, v_old, dt=cfg.dt,
                                  data=(obc or {}).get("v"), stagger="v",
                                  tau_in=m3in, tau_out=cfg.nudg.m3nudg)
    un, vn, ubar, vbar, Huon, Hvom = pallas_uv.uv_finish_pallas(
        cfg, grid, un, vn, Hz, Huon_old, Hvom_old,
        avg.DU_avg1, avg.DV_avg1, avg.DU_avg2, avg.DV_avg2,
        interpret=interp)
    # same post-correction ghost-ring re-wrap as the jnp path
    if cfg.bc.ew_periodic:
        un, vn = st.periodic_x(un), st.periodic_x(vn)
    if cfg.bc.ns_periodic:
        un, vn = st.periodic_y(un), st.periodic_y(vn)
    ubar = boundary.bc_u(ubar, cfg.bc.ubar, cfg.gamma2,
                         bdata=(obc or {}).get("ubar"))
    vbar = boundary.bc_v(vbar, cfg.bc.vbar, cfg.gamma2,
                         bdata=(obc or {}).get("vbar"))
    return un, vn, ubar, vbar, Huon, Hvom
