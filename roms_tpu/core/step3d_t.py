"""Tracer corrector: advection of the half-step tracer by time-centered
mass fluxes, then backward-implicit vertical diffusion.

Re-implements ROMS/Nonlinear/step3d_t.F with the full per-tracer scheme
dispatch (centered/upstream/Akima/HSIMT-TVD, plus MPDATA via
core.mpdata; step3d_t.F:432-700 semantics).  t_part
arrives from pre_step3d as Hz_old*t(n) + dt*(surface-bottom fluxes); all
divergences subtract in (Tunits m); the final division by the new Hz
happens inside the implicit solve (standard path) or explicitly before
the spline solve (SPLINES_VDIFF, step3d_t.F:1353-1356).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st
from ..ops.tridiag import implicit_vdiff_solve, spline_flux_solve
from . import advection, boundary, obc as obc_mod


def step3d_t(cfg: ModelConfig, grid: Grid, t_half, t_part,
             Huon, Hvom, W, Hz, z_r, Akt, t_old=None, obc=None,
             Wi=None, collect_diag: bool = False,
             collect_tfx: bool = False):
    """Returns t at n+1 (NT, N, Mj, Li); with collect_diag also a dict
    of per-term Hz-weighted increments (DIAGNOSTICS_TS, set_diags.F:
    iThadv/iTvadv/iTvdif conventions, Tunits m per step).

    Hz/z_r: NEW depths; Huon/Hvom/W: time-centered corrected fluxes;
    Akt: (NAT, N+1, Mj, Li) interface diffusivities.
    """
    dt = cfg.dt
    pmn = grid.pm * grid.pn
    NAT = Akt.shape[0]
    out = []
    dia = {"hadv": [], "vadv": [], "vdif": []}
    from ..config import HSIMT, MPDATA
    from ..ops import pallas_tadv
    tfx = {"FX": [], "FE": []}
    if pallas_tadv.use_pallas_tadv(cfg, "corrector") \
            and not collect_diag and not collect_tfx:
        # fused UP3+C4 advection of all tracers in one VMEM pass
        tn_all = pallas_tadv.corrector_pallas(cfg, grid, t_half,
                                              t_part, Huon, Hvom, W,
                                              Hz)
        if Wi is not None:
            from ..ops.tridiag import implicit_adv_solve
            FCw = dt * pmn[None] * Wi
            tn_all = jax.vmap(
                lambda tn: implicit_adv_solve(Hz, FCw, tn) * Hz)(
                    tn_all)
        out = [tn_all[itrc] for itrc in range(cfg.NT)]
        return _vdiff_and_bc(cfg, grid, out, dia, Hz, z_r, Akt, t_old,
                             obc, collect_diag)
    for itrc in range(cfg.NT):
        # per-tracer scheme registry (tadv.F:146-180)
        h_s, v_s = cfg.tracer_hadv(itrc), cfg.tracer_vadv(itrc)
        if h_s == MPDATA:
            # monotone two-pass MPDATA replaces the centered corrector
            # advection entirely (step3d_t.F:873-1481)
            from . import mpdata as mpdata_mod
            tn = mpdata_mod.mpdata_step(cfg, grid, t_half[itrc],
                                        t_part[itrc], Huon, Hvom, W,
                                        Hz, z_r)
            dia["hadv"].append(tn - t_part[itrc])   # lumped 3D adv
            dia["vadv"].append(jnp.zeros_like(tn))
        else:
            if h_s == HSIMT:
                FX, FE = advection.hadv_flux_hsimt(cfg, grid,
                                                   t_half[itrc],
                                                   Huon, Hvom, Hz)
            else:
                FX, FE = advection.hadv_flux(cfg, grid, t_half[itrc],
                                             Huon, Hvom, h_s)
            hadv_inc = -dt * pmn * (st.dx_p(FX) + st.dy_p(FE))
            tn = t_part[itrc] + hadv_inc
            dia["hadv"].append(hadv_inc)
            if collect_tfx:
                # corrector face fluxes for the two-way nesting
                # refluxing step (nesting.F:3047-3459 tl_adv arrays)
                tfx["FX"].append(FX)
                tfx["FE"].append(FE)
            if v_s == HSIMT:
                FC = advection.vadv_flux_hsimt(cfg, grid, t_half[itrc],
                                               W, z_r)
            else:
                FC = advection.vadv_flux(cfg, t_half[itrc], W, Hz,
                                         v_s)
            vadv_inc = -dt * pmn * (FC[1:] - FC[:-1])
            tn = tn + vadv_inc
            dia["vadv"].append(vadv_inc)

        if Wi is not None:
            # OMEGA_IMPLICIT: upwind-implicit solve with the vertical
            # remainder before diffusion (step3d_t.F:1553-1680)
            from ..ops.tridiag import implicit_adv_solve
            FCw = dt * pmn[None] * Wi
            tn_new = implicit_adv_solve(Hz, FCw, tn) * Hz
            if collect_diag:
                dia["vadv"][-1] = dia["vadv"][-1] + (tn_new - tn)
            tn = tn_new
        out.append(tn)                     # Hz-weighted, pre-diffusion

    res = _vdiff_and_bc(cfg, grid, out, dia, Hz, z_r, Akt, t_old, obc,
                        collect_diag)
    if collect_tfx:
        if len(tfx["FX"]) != cfg.NT:
            raise ValueError(
                "collect_tfx unsupported for the selected advection "
                "schemes (MPDATA has no face-flux form)")
        tfx = {"FX": jnp.stack(tfx["FX"]), "FE": jnp.stack(tfx["FE"])}
        if collect_diag:
            return res[0], res[1], tfx
        return res, tfx
    return res


def _vdiff_and_bc(cfg, grid, out, dia, Hz, z_r, Akt, t_old, obc,
                  collect_diag):
    # ---- batched implicit vertical diffusion: all tracers' columns
    # batch along a NEW (unsharded) axis after k into ONE tridiagonal
    # solve (the six-solve launch consolidation of the optimization
    # roadmap).  A new axis — NOT a j-concat: concatenating along the
    # eta axis would cross the (eta, xi) mesh sharding, moving every
    # column between shards and breaking shard invariance. ------------
    dt = cfg.dt
    NAT = Akt.shape[0]
    pre = out
    from ..ops import pallas_vdiff
    if cfg.mixing.splines_vdiff and pallas_vdiff.use_pallas_vdiff(cfg):
        # fused per-column solve (coefficients + Thomas in VMEM,
        # ops/pallas_vdiff.py); returns (NT, N, Mj, Li)
        solk = pallas_vdiff.spline_vdiff_pallas(
            cfg, pre, Hz, Akt, interpret=pallas_vdiff._interp())
        sol = jnp.swapaxes(solk, 0, 1)
        return _finish_tracers(cfg, grid, sol, pre, dia, Hz, t_old,
                               obc, collect_diag)
    Aks = jnp.stack([Akt[min(itrc, NAT - 1)] for itrc in range(cfg.NT)],
                    axis=1)
    Hzs = jnp.stack([Hz] * cfg.NT, axis=1)
    if cfg.mixing.splines_vdiff:
        q_s = jnp.stack([t / Hz for t in pre], axis=1)
        sol = q_s + spline_flux_solve(Hzs, Aks, q_s, dt)
    else:
        dz_inv = 1.0 / (z_r[1:] - z_r[:-1])
        q_s = jnp.stack(pre, axis=1)
        dz_s = jnp.stack([dz_inv] * cfg.NT, axis=1)
        sol = implicit_vdiff_solve(Hzs, Aks, dz_s, q_s, dt)

    return _finish_tracers(cfg, grid, sol, pre, dia, Hz, t_old, obc,
                           collect_diag)


def _finish_tracers(cfg, grid, sol, pre, dia, Hz, t_old, obc,
                    collect_diag):
    """Per-tracer vdif diagnostic, lateral BCs, radiation OBCs.
    sol: (N, NT, Mj, Li) tracer-unit solution."""
    out = []
    for itrc in range(cfg.NT):
        tn = sol[:, itrc]
        dia["vdif"].append(tn * Hz - pre[itrc])
        tdat_all = (obc or {}).get("t") or {}
        tn = boundary.bc_rho(tn, cfg.bc.t, bdata=tdat_all.get(itrc))
        if t_old is not None:
            tdat = (obc or {}).get("t")
            tin, tout = cfg.nudg.tobc(itrc)
            tn = obc_mod.radiation_3d(
                cfg, cfg.bc.t, tn, t_old[itrc], dt=cfg.dt,
                data=None if tdat is None else tdat.get(itrc),
                tau_in=tin, tau_out=tout)
        out.append(tn)
    if collect_diag:
        return jnp.stack(out), {k: jnp.stack(v) for k, v in dia.items()}
    return jnp.stack(out)
