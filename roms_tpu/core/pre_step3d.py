"""Predictor (n+1/2) stage of the 3D engine.

Re-implements ROMS/Nonlinear/pre_step3d.F:

  - tracer predictor: AB2-weighted horizontal + vertical advection of
    t(nstp)/t(nnew=n-1) into the half-step field `t_half` (tracer units,
    pre_step3d.F:260-700);
  - tracer corrector seed: `t_part` = Hz*t(nstp) + dt*(surface-bottom
    flux) in (Tunits m), the RHS of step3d_t's implicit solve
    (pre_step3d.F:700-746, with lambda=1 backward-implicit so interior
    explicit diffusion vanishes);
  - momentum corrector seed: `u_part`/`v_part` = Hz_u*u(nstp) + AB3
    history contribution + dt*(stress) in (m2/s), the RHS completed by
    step3d_uv (pre_step3d.F:750-900).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st
from . import advection, boundary


def pre_step3d(cfg: ModelConfig, grid: Grid, u, v, t, t_prev,
               ru_prev, rv_prev, ru_prev2, rv_prev2,
               Hz, z_r, z_w, Huon, Hvom, W, forcing, bustr, bvstr, iic,
               ghats=None):
    """Returns (t_half, t_part, u_part, v_part).

    All inputs at time n (nstp); t_prev at n-1 (nnew slot on entry);
    ru_prev/ru_prev2: 3D momentum RHS at n-1 / n-2.  iic: step counter
    (0 at the cold-start first step, mirrors iic==ntfirst).
    """
    dt = cfg.dt
    pmn = grid.pm * grid.pn
    NT = cfg.NT

    # ------------------------------------------------------------------
    # Tracer predictor -> t_half (tracer units at n+1/2)
    # ------------------------------------------------------------------
    from ..config import HSIMT, MPDATA
    from ..ops import pallas_tadv
    if pallas_tadv.use_pallas_tadv(cfg, "predictor"):
        # fused UP3+C4 predictor for all tracers in one VMEM pass
        Gamma = 1.0 / 6.0
        cffk = jnp.where(iic == 0, 0.5 * dt, (1.0 - Gamma) * dt)
        cff1k = jnp.where(iic == 0, 1.0, 0.5 + Gamma)
        cff2k = jnp.where(iic == 0, 0.0, 0.5 - Gamma)
        t_half = pallas_tadv.predictor_pallas(
            cfg, grid, t, t_prev, Huon, Hvom, W, Hz,
            cffk, cff1k, cff2k)
        t_half = boundary.bc_rho(t_half, cfg.bc.t)
        return t_half, *_seeds(cfg, grid, u, v, t, ru_prev, rv_prev,
                               ru_prev2, rv_prev2, Hz, z_w, forcing,
                               bustr, bvstr, iic, ghats)
    t_half = []
    for itrc in range(NT):
        # per-tracer scheme registry (tadv.F:146-180); Gamma staging and
        # the AB2 weights depend on the tracer's own scheme
        h_s, v_s = cfg.tracer_hadv(itrc), cfg.tracer_vadv(itrc)
        hsimt = h_s == HSIMT
        mpdata = h_s == MPDATA
        Gamma = 0.5 if (hsimt or mpdata) else 1.0 / 6.0
        cff = jnp.where(iic == 0, 0.5 * dt, (1.0 - Gamma) * dt)
        cff1 = jnp.where(iic == 0, 1.0, 0.5 + Gamma)
        cff2 = jnp.where(iic == 0, 0.0, 0.5 - Gamma)
        if hsimt:
            FX, FE = advection.hadv_flux_hsimt(cfg, grid, t[itrc],
                                               Huon, Hvom, Hz)
        elif mpdata:
            FX, FE = advection.hadv_flux(cfg, grid, t[itrc], Huon, Hvom,
                                         "upwind1")
        else:
            FX, FE = advection.hadv_flux(cfg, grid, t[itrc], Huon, Hvom,
                                         h_s)
        th = Hz * (cff1 * t[itrc] + cff2 * t_prev[itrc]) - \
            cff * pmn * (st.dx_p(FX) + st.dy_p(FE))
        # vertical advection + implied new thickness (pre_step3d.F:655-686)
        if v_s == HSIMT:
            FC = advection.vadv_flux_hsimt(cfg, grid, t[itrc], W, z_r)
        elif mpdata or v_s == MPDATA:
            FC = advection.vadv_flux(cfg, t[itrc], W, Hz, "upwind1")
        else:
            FC = advection.vadv_flux(cfg, t[itrc], W, Hz, v_s)
        DC = 1.0 / (Hz - cff * pmn * (st.dx_p(Huon) + st.dy_p(Hvom)
                                      + (W[1:] - W[:-1])))
        th = DC * (th - cff * pmn * (FC[1:] - FC[:-1]))
        th = boundary.bc_rho(th, cfg.bc.t)
        t_half.append(th)
    t_half = jnp.stack(t_half)

    return t_half, *_seeds(cfg, grid, u, v, t, ru_prev, rv_prev,
                           ru_prev2, rv_prev2, Hz, z_w, forcing,
                           bustr, bvstr, iic, ghats)


def _seeds(cfg, grid, u, v, t, ru_prev, rv_prev, ru_prev2, rv_prev2,
           Hz, z_w, forcing, bustr, bvstr, iic, ghats):
    """Column-local corrector seeds shared by both predictor paths."""
    dt = cfg.dt
    NT = cfg.NT
    # ------------------------------------------------------------------
    # Tracer corrector seed (Hz*t + dt*surface/bottom fluxes); lambda=1
    # kills the interior explicit diffusion piece (pre_step3d.F:700-746).
    # ------------------------------------------------------------------
    t_part = []
    NAT = cfg.NAT
    if cfg.mixing.solar_source:
        # Paulson-Simpson penetrative shortwave at interior interfaces
        # (pre_step3d.F SOLAR_SOURCE block)
        from .lmd import swdk_frac
        swdk_i = swdk_frac(z_w[-1][None] - z_w[1:-1],
                           cfg.mixing.jwtype)
    for itrc in range(NT):
        FC_int = jnp.zeros_like(Hz[:-1])
        if ghats is not None and itrc < NAT:
            # LMD_NONLOCAL: FC -= dt*(Akt*ghats) (pre_step3d.F:705-713);
            # the caller passes ghats premultiplied by Akt.
            FC_int = FC_int - dt * ghats[itrc][1:-1]
        if cfg.mixing.solar_source and itrc == 0:
            FC_int = FC_int + dt * forcing.srflx[None] * swdk_i
        FCd = jnp.concatenate(
            [dt * forcing.btflx[itrc][None],
             FC_int,
             dt * forcing.stflx[itrc][None]], axis=0)
        t_part.append(Hz * t[itrc] + (FCd[1:] - FCd[:-1]))
    t_part = jnp.stack(t_part)

    # ------------------------------------------------------------------
    # Momentum corrector seed (pre_step3d.F:750-900):
    #   u_part = Hz_u*u + DC0*(ca*ru_{n-1} + cb*ru_{n-2}) + stress fluxes
    # completed in step3d_uv by + DC0'*ru_n (AB3).
    # ------------------------------------------------------------------
    Hz_u = 0.5 * (Hz + st.im1(Hz))
    Hz_v = 0.5 * (Hz + st.jm1(Hz))
    DC0u = dt * 0.25 * (grid.pm + st.im1(grid.pm)) * \
        (grid.pn + st.im1(grid.pn))
    DC0v = dt * 0.25 * (grid.pm + st.jm1(grid.pm)) * \
        (grid.pn + st.jm1(grid.pn))
    # AB3: u_{n+1} = u_n + dt*(23/12 r_n - 16/12 r_{n-1} + 5/12 r_{n-2});
    # the 23/12 r_n piece is added in step3d_uv after rhs3d fills r_n.
    # Start-up: FE (iic==0), then AB2 (iic==1: 3/2 r_n - 1/2 r_{n-1}).
    ca = jnp.where(iic == 0, 0.0,
                   jnp.where(iic == 1, -0.5, -16.0 / 12.0))
    cb = jnp.where(iic <= 1, 0.0, 5.0 / 12.0)
    if cfg.bodyforce:
        # BODYFORCE (rhs3d.F body-force branch, LEVSFRC): the wind
        # stress is deposited over levels levsfrc..N weighted by layer
        # thickness — same vertical integral as the surface-flux path
        # (so integrate_rufrc's 2D coupling is unchanged), FE in time
        # like this engine's surface-stress treatment.
        lev0 = max(0, int(cfg.levsfrc) - 1)
        mask = jnp.arange(Hz.shape[0])[:, None, None] >= lev0
        wu = jnp.where(mask, Hz_u, 0.0)
        wv = jnp.where(mask, Hz_v, 0.0)
        wu = wu / jnp.sum(wu, axis=0, keepdims=True)
        wv = wv / jnp.sum(wv, axis=0, keepdims=True)
        su = dt * forcing.sustr[None] * wu
        sv = dt * forcing.svstr[None] * wv
        FCu = jnp.concatenate([dt * bustr[None],
                               jnp.zeros_like(Hz)], axis=0)
        FCv = jnp.concatenate([dt * bvstr[None],
                               jnp.zeros_like(Hz)], axis=0)
    else:
        su = sv = 0.0
        FCu = jnp.concatenate([dt * bustr[None], jnp.zeros_like(Hz[:-1]),
                               dt * forcing.sustr[None]], axis=0)
        FCv = jnp.concatenate([dt * bvstr[None], jnp.zeros_like(Hz[:-1]),
                               dt * forcing.svstr[None]], axis=0)
    u_part = u * Hz_u + DC0u * (ca * ru_prev + cb * ru_prev2) + \
        (FCu[1:] - FCu[:-1]) + su
    v_part = v * Hz_v + DC0v * (ca * rv_prev + cb * rv_prev2) + \
        (FCv[1:] - FCv[:-1]) + sv

    return t_part, u_part, v_part
