"""Open-boundary conditions: radiation, Chapman, Flather, clamped with
external data and nudging.

Re-implements the per-edge dispatch of ROMS/Nonlinear/zetabc.F,
u2dbc_im.F, v2dbc_im.F, u3dbc_im.F, v3dbc_im.F, t3dbc_im.F for the open
families (the closed/gradient/periodic families live in core.boundary).

Geometry trick: every edge is handled by one oriented kernel.  `_orient`
rotates/flips the array so the processed boundary is always the LAST
column of the last axis; the inverse transform writes the result back.
All work on the ghost line is 1-D per (k,) level — negligible cost, no
dynamic shapes.

External data enters as a dict pytree, e.g.
  obc = {"zeta": {"west": zw}, "ubar": {"west": uw}}
with per-edge arrays shaped like the corresponding boundary line
(Mj or Li, or (N, Mj) for 3-D fields).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .. import constants
from ..config import (LBC, ModelConfig, CHAPMAN_EXPLICIT, CHAPMAN_IMPLICIT,
                      CLAMPED, FLATHER, GRADIENT, RADIATION, REDUCED,
                      SHCHEPETKIN)

_EPS = 1.0e-20


# ---------------------------------------------------------------------------
# Blocked (shard_map) open-boundary machinery: the same edge formulas
# evaluated with rolls + (grow, gcol) masked writes so each device
# applies only the edges it owns (parallel.blockctx; round-5 engine
# phase (b)).  The oriented-kernel path below stays the single-chip
# implementation; every public function dispatches on the active ctx.
# ---------------------------------------------------------------------------

class _Side:
    """Roll toolkit for one edge under a BlockCtx."""

    def __init__(self, ctx, side):
        self.ctx = ctx
        self.side = side
        self.xi = side in ("west", "east")
        self.ax = -1 if self.xi else -2
        self.sgn = -1 if side in ("west", "south") else +1

    def inw(self, a, k=1):
        """Value k cells INWARD of the current position."""
        return jnp.roll(a, self.sgn * k, axis=self.ax)

    def tan_m(self, a):
        return jnp.roll(a, 1, axis=(-2 if self.xi else -1))

    def tan_p(self, a):
        return jnp.roll(a, -1, axis=(-2 if self.xi else -1))

    def gidx(self, offset=0):
        """Global index of the ghost line (+offset cells inward)."""
        if self.side in ("west", "south"):
            return offset
        n = self.ctx.Lm if self.xi else self.ctx.Mm
        return n + 1 - offset

    def setg(self, f, value, offset=0):
        from ..parallel import blockctx as bx
        g = self.gidx(offset)
        if self.xi:
            return bx._set_col(f, self.ctx, g, value)
        return bx._set_row(f, self.ctx, g, value)

    def zero_tan_ends(self, gm, gp):
        """Zero the tangential gradients beyond the domain ends
        (the oriented kernel's zl padding)."""
        ctx = self.ctx
        if self.xi:
            gm = jnp.where((ctx.grow == 0)[:, None], 0.0, gm)
            gp = jnp.where((ctx.grow == ctx.Mm + 1)[:, None], 0.0, gp)
        else:
            if not ctx.xi_periodic:
                gm = jnp.where(ctx.gcol == 0, 0.0, gm)
                gp = jnp.where(ctx.gcol == ctx.Lm + 1, 0.0, gp)
        return gm, gp


def _radiation_blocked(sd: _Side, new, old, tau_in=0.0, tau_out=0.0,
                       data=None, radiation_2d=False, dt=None):
    """_radiation_line evaluated IN PLACE at every point; the caller
    mask-writes the result at the boundary position (ghost, or the
    wall point for the u-west/v-south staggers) where the inward
    rolls line up exactly with the oriented kernel's columns."""
    o_b = old
    o1 = sd.inw(old, 1)
    n1 = sd.inw(new, 1)
    n2 = sd.inw(new, 2)
    dZdt = o1 - n1
    dZdx = n1 - n2
    gb_m = o1 - sd.tan_m(o1)
    gb_p = sd.tan_p(o1) - o1
    gg_m = o_b - sd.tan_m(o_b)
    gg_p = sd.tan_p(o_b) - o_b
    gb_m, gb_p = sd.zero_tan_ends(gb_m, gb_p)
    gg_m, gg_p = sd.zero_tan_ends(gg_m, gg_p)
    inflow = dZdt * dZdx < 0.0
    dZdt = jnp.where(inflow, 0.0, dZdt)
    dZde = jnp.where(dZdt * (gb_m + gb_p) > 0.0, gb_m, gb_p)
    cff = jnp.maximum(dZdx * dZdx + dZde * dZde, _EPS)
    Cx = dZdt * dZdx
    if radiation_2d:
        Ce = jnp.clip(dZdt * dZde, -cff, cff)
    else:
        Ce = jnp.zeros_like(Cx)
    ghost = (cff * o_b + Cx * n1
             - jnp.maximum(Ce, 0.0) * gg_m
             - jnp.minimum(Ce, 0.0) * gg_p) / (cff + Cx)
    if data is not None and (tau_in or tau_out):
        tau = jnp.where(inflow, tau_in, tau_out) * dt
        ghost = ghost + tau * (_edge_data_blocked(sd, data) - o_b)
    return ghost


def _edge_data_blocked(sd: _Side, val):
    """Align a blocked boundary LINE with the field's 2-D block: W/E
    lines are (..., rows) -> add a trailing axis."""
    if val is None:
        return None
    if hasattr(val, "ndim") and sd.xi:
        return val[..., :, None]
    return val


def _orient(f, side):
    """Return f with the `side` boundary as the last column of axis -1."""
    if side == "east":
        return f
    if side == "west":
        return jnp.flip(f, axis=-1)
    if side == "north":
        return jnp.swapaxes(f, -1, -2)
    if side == "south":
        return jnp.flip(jnp.swapaxes(f, -1, -2), axis=-1)
    raise ValueError(side)


def _restore(f, side):
    if side == "east":
        return f
    if side == "west":
        return jnp.flip(f, axis=-1)
    if side == "north":
        return jnp.swapaxes(f, -1, -2)
    if side == "south":
        return jnp.swapaxes(jnp.flip(f, axis=-1), -1, -2)
    raise ValueError(side)


def _radiation_line(new, old, tau_in=0.0, tau_out=0.0, data=None,
                    radiation_2d: bool = False, dt=None):
    """Oblique radiation update of the ghost line (zetabc.F:205-260).

    new/old: oriented arrays (..., rows, cols); boundary ghost is col -1,
    interior neighbor col -2, next col -3.  Returns the new ghost line.
    """
    dZdt = old[..., :, -2] - new[..., :, -2]
    dZdx = new[..., :, -2] - new[..., :, -3]
    # tangential gradients of `old` at the two outermost columns,
    # at "v-like" points between rows
    gb = old[..., 1:, -2] - old[..., :-1, -2]     # rows-1
    gg = old[..., 1:, -1] - old[..., :-1, -1]
    zl = jnp.zeros_like(gb[..., :1])
    gb_m = jnp.concatenate([zl, gb], axis=-1)     # grad at (row)
    gb_p = jnp.concatenate([gb, zl], axis=-1)     # grad at (row+1)
    gg_m = jnp.concatenate([zl, gg], axis=-1)
    gg_p = jnp.concatenate([gg, zl], axis=-1)

    inflow = dZdt * dZdx < 0.0       # inflow BEFORE zeroing (zetabc.F:139)
    dZdt = jnp.where(inflow, 0.0, dZdt)
    dZde = jnp.where(dZdt * (gb_m + gb_p) > 0.0, gb_m, gb_p)
    cff = jnp.maximum(dZdx * dZdx + dZde * dZde, _EPS)
    Cx = dZdt * dZdx
    if radiation_2d:
        Ce = jnp.clip(dZdt * dZde, -cff, cff)
    else:
        Ce = jnp.zeros_like(Cx)
    ghost = (cff * old[..., :, -1] + Cx * new[..., :, -2]
             - jnp.maximum(Ce, 0.0) * gg_m
             - jnp.minimum(Ce, 0.0) * gg_p) / (cff + Cx)
    if data is not None and (tau_in or tau_out):
        tau = jnp.where(inflow, tau_in, tau_out) * dt
        ghost = ghost + tau * (data - old[..., :, -1])
    return ghost


def _zetabc_blocked(cfg, grid, z_new, z_old, dt2d, data, ctx):
    """zetabc under a BlockCtx: same per-edge formulas via inward
    rolls + masked ghost writes (zetabc.F:205-260)."""
    g = cfg.g
    for side in ("west", "south", "east", "north"):
        kind = getattr(cfg.bc.zeta, side)
        if kind not in (CHAPMAN_IMPLICIT, CHAPMAN_EXPLICIT, RADIATION,
                        CLAMPED):
            continue
        sd = _Side(ctx, side)
        if kind == CLAMPED and side in data:
            ghost = _edge_data_blocked(sd, data[side])
            ghost = jnp.broadcast_to(ghost, z_new.shape)
        elif kind == RADIATION:
            tin = tout = 0.0
            if side in cfg.bc.zeta.nudge:
                tout = cfg.nudg.znudg
                tin = cfg.nudg.obcfac * cfg.nudg.znudg
            ghost = _radiation_blocked(sd, z_new, z_old, tau_in=tin,
                                       tau_out=tout,
                                       data=data.get(side), dt=dt2d)
        else:
            pm_ = grid.pm if sd.xi else grid.pn
            cffp = dt2d * sd.inw(pm_, 1)
            cff1 = jnp.sqrt(g * (sd.inw(grid.h, 1)
                                 + sd.inw(z_old, 1)))
            Cx = cffp * cff1
            if kind == CHAPMAN_IMPLICIT:
                ghost = (z_old + Cx * sd.inw(z_new, 1)) / (1.0 + Cx)
            else:
                ghost = (1.0 - Cx) * z_old + Cx * sd.inw(z_old, 1)
        z_new = sd.setg(z_new, ghost)
    return z_new


def zetabc(cfg: ModelConfig, grid, z_new, z_old, dt2d, obc=None):
    """Open-boundary updates for the free surface applied AFTER the
    closed/gradient/periodic pass of boundary.bc_rho.  Handles
    Chapman implicit/explicit, clamped-with-data, radiation."""
    data = (obc or {}).get("zeta", {})
    g = cfg.g
    from ..parallel import blockctx
    ctx = blockctx.current()
    if ctx is not None:
        return _zetabc_blocked(cfg, grid, z_new, z_old, dt2d, data,
                               ctx)
    for side in ("west", "south", "east", "north"):
        kind = getattr(cfg.bc.zeta, side)
        if kind not in (CHAPMAN_IMPLICIT, CHAPMAN_EXPLICIT, RADIATION,
                        CLAMPED):
            continue
        zn = _orient(z_new, side)
        zo = _orient(z_old, side)
        if kind == CLAMPED and side in data:
            ghost = jnp.broadcast_to(data[side], zn[..., :, -1].shape)
        elif kind == RADIATION:
            tin = tout = 0.0
            if side in cfg.bc.zeta.nudge:
                # FSobc_in/out radiation nudging (zetabc.F:139-146,
                # inp_par.F:729-731)
                tout = cfg.nudg.znudg
                tin = cfg.nudg.obcfac * cfg.nudg.znudg
            ghost = _radiation_line(zn, zo, tau_in=tin, tau_out=tout,
                                    data=data.get(side), dt=dt2d)
        else:
            h_o = _orient(grid.h, side)
            pm_o = _orient(grid.pm if side in ("west", "east")
                           else grid.pn, side)
            cff = dt2d * pm_o[..., :, -2]
            cff1 = jnp.sqrt(g * (h_o[..., :, -2] + zo[..., :, -2]))
            Cx = cff * cff1
            if kind == CHAPMAN_IMPLICIT:
                ghost = (zo[..., :, -1] + Cx * zn[..., :, -2]) / (1.0 + Cx)
            else:
                ghost = (1.0 - Cx) * zo[..., :, -1] + Cx * zo[..., :, -2]
        z_new = _restore(zn.at[..., :, -1].set(ghost), side)
    return z_new


def _u2dbc_flather_blocked(cfg, grid, ubar_new, vbar_new, z_old,
                           obc, ctx, ub_old=None, vb_old=None,
                           dt2d=None):
    """Flather under a BlockCtx (u2dbc_im.F:224-292).  The W/E normal
    velocity boundary point is global col 1 / Lm+1; the value is also
    copied into the dead west ghost col 0 (reference ghost fill)."""
    g = cfg.g
    zdat = obc.get("zeta", {})
    udat = obc.get("ubar", {})
    vdat = obc.get("vbar", {})
    for side in ("west", "east"):
        if getattr(cfg.bc.ubar, side) != FLATHER:
            continue
        sd = _Side(ctx, side)
        sign = +1.0 if side == "east" else -1.0
        D = 0.5 * (grid.h + z_old + sd.inw(grid.h, 1)
                   + sd.inw(z_old, 1))
        Cx = jnp.sqrt(g / D)
        zavg = 0.5 * (z_old + sd.inw(z_old, 1))
        zd = _edge_data_blocked(sd, zdat.get(side, 0.0))
        ud = _edge_data_blocked(sd, udat.get(side, 0.0))
        ghost = ud + sign * Cx * (zavg - zd)
        if side == "west":
            # the oriented kernel evaluates at the ghost position
            # (rho-stagger D/z use cols 0,1) then copies that value
            # into the wall U-point: write col 1 with the value
            # evaluated one cell OUTWARD, and col 0 in place
            ubar_new = sd.setg(ubar_new, sd.inw(ghost, -1), offset=1)
            ubar_new = sd.setg(ubar_new, ghost, offset=0)
        else:
            ubar_new = sd.setg(ubar_new, ghost)
    for side in ("south", "north"):
        if getattr(cfg.bc.vbar, side) != FLATHER:
            continue
        sd = _Side(ctx, side)
        sign = +1.0 if side == "north" else -1.0
        D = 0.5 * (grid.h + z_old + sd.inw(grid.h, 1)
                   + sd.inw(z_old, 1))
        Cx = jnp.sqrt(g / D)
        zavg = 0.5 * (z_old + sd.inw(z_old, 1))
        zd = _edge_data_blocked(sd, zdat.get(side, 0.0))
        vd = _edge_data_blocked(sd, vdat.get(side, 0.0))
        ghost = vd + sign * Cx * (zavg - zd)
        if side == "south":
            vbar_new = sd.setg(vbar_new, sd.inw(ghost, -1), offset=1)
            vbar_new = sd.setg(vbar_new, ghost, offset=0)
        else:
            vbar_new = sd.setg(vbar_new, ghost)

    # tangential Chapman at Flather-family edges (v2dbc_im.F:985-1005)
    if dt2d is not None:
        fam = (FLATHER, SHCHEPETKIN, REDUCED)
        hz = grid.h + z_old
        for side in ("west", "east"):
            if getattr(cfg.bc.vbar, side) not in fam:
                continue
            sd = _Side(ctx, side)
            pm_v = 0.5 * (grid.pm + jnp.roll(grid.pm, 1, axis=-2))
            hz_v = 0.5 * (hz + jnp.roll(hz, 1, axis=-2))
            Cx = dt2d * sd.inw(pm_v, 1) * \
                jnp.sqrt(g * jnp.maximum(sd.inw(hz_v, 1), _EPS))
            vbar_new = sd.setg(
                vbar_new,
                (vb_old + Cx * sd.inw(vbar_new, 1)) / (1.0 + Cx))
        for side in ("south", "north"):
            if getattr(cfg.bc.ubar, side) not in fam:
                continue
            sd = _Side(ctx, side)
            pn_u = 0.5 * (grid.pn + jnp.roll(grid.pn, 1, axis=-1))
            hz_u = 0.5 * (hz + jnp.roll(hz, 1, axis=-1))
            Cx = dt2d * sd.inw(pn_u, 1) * \
                jnp.sqrt(g * jnp.maximum(sd.inw(hz_u, 1), _EPS))
            ubar_new = sd.setg(
                ubar_new,
                (ub_old + Cx * sd.inw(ubar_new, 1)) / (1.0 + Cx))
    return ubar_new, vbar_new


def u2dbc_flather(cfg: ModelConfig, grid, ubar_new, vbar_new,
                  z_old, ub_old, vb_old, obc=None, dt2d=None):
    """Flather radiation for the normal barotropic velocity
    (u2dbc_im.F:224-292 and v2dbc counterpart, no-tides branch):

        u_b = u_data -/+ sqrt(g/D) * (zeta_avg - zeta_data)

    Tangential components at a Flather/Shchepetkin/reduced edge take
    the Chapman-implicit propagation condition (v2dbc_im.F:985-1005
    western-edge branch and mirrors) when dt2d is provided.
    """
    obc = obc or {}
    g = cfg.g
    from ..parallel import blockctx
    ctx = blockctx.current()
    if ctx is not None:
        return _u2dbc_flather_blocked(cfg, grid, ubar_new, vbar_new,
                                      z_old, obc, ctx, ub_old, vb_old,
                                      dt2d)

    def edge(f, vel_data, z_data, side, sign):
        fo = _orient(f, side)
        ho = _orient(grid.h, side)
        zo = _orient(z_old, side)
        D = 0.5 * (ho[..., :, -1] + zo[..., :, -1]
                   + ho[..., :, -2] + zo[..., :, -2])
        Cx = jnp.sqrt(g / D)
        zavg = 0.5 * (zo[..., :, -1] + zo[..., :, -2])
        ghost = vel_data + sign * Cx * (zavg - z_data)
        return _restore(fo.at[..., :, -1].set(ghost), side)

    zdat = obc.get("zeta", {})
    udat = obc.get("ubar", {})
    vdat = obc.get("vbar", {})
    for side in ("west", "east"):
        if getattr(cfg.bc.ubar, side) == FLATHER:
            sign = +1.0 if side == "east" else -1.0
            # NOTE west boundary U-point is column 1; the oriented frame
            # puts it at the flipped last column which is column 0 (the
            # dead ghost).  Write both the wall point and ghost.
            ubar_new = edge(ubar_new, udat.get(side, 0.0),
                            zdat.get(side, 0.0), side, sign)
            if side == "west":
                # copy ghost into the physical wall U-point (col 1)
                ubar_new = ubar_new.at[..., :, 1].set(ubar_new[..., :, 0])
    for side in ("south", "north"):
        if getattr(cfg.bc.vbar, side) == FLATHER:
            sign = +1.0 if side == "north" else -1.0
            vbar_new = edge(vbar_new, vdat.get(side, 0.0),
                            zdat.get(side, 0.0), side, sign)
            if side == "south":
                vbar_new = vbar_new.at[..., 1, :].set(vbar_new[..., 0, :])

    # tangential Chapman at Flather-family edges (v2dbc_im.F:985-1005)
    if dt2d is not None:
        from ..ops import stencil as st
        fam = (FLATHER, SHCHEPETKIN, REDUCED)
        hz = grid.h + z_old
        for side in ("west", "east"):
            if getattr(cfg.bc.vbar, side) not in fam:
                continue
            pm_v = 0.5 * (grid.pm + st.jm1(grid.pm))
            hz_v = 0.5 * (hz + st.jm1(hz))
            col = 1 if side == "west" else -2
            at = 0 if side == "west" else -1
            Cx = dt2d * pm_v[..., :, col] * \
                jnp.sqrt(g * jnp.maximum(hz_v[..., :, col], _EPS))
            vbar_new = vbar_new.at[..., :, at].set(
                (vb_old[..., :, at] + Cx * vbar_new[..., :, col])
                / (1.0 + Cx))
        for side in ("south", "north"):
            if getattr(cfg.bc.ubar, side) not in fam:
                continue
            pn_u = 0.5 * (grid.pn + st.im1(grid.pn))
            hz_u = 0.5 * (hz + st.im1(hz))
            row = 1 if side == "south" else -2
            at = 0 if side == "south" else -1
            Cx = dt2d * pn_u[..., row, :] * \
                jnp.sqrt(g * jnp.maximum(hz_u[..., row, :], _EPS))
            ubar_new = ubar_new.at[..., at, :].set(
                (ub_old[..., at, :] + Cx * ubar_new[..., row, :])
                / (1.0 + Cx))
    return ubar_new, vbar_new


def u2dbc_shchepetkin(cfg: ModelConfig, grid, ubar_new, vbar_new,
                      z_new, z_old, ub_old, vb_old, dt2d, obc=None):
    """Shchepetkin 2D-momentum open boundary (u2dbc_im.F:294-365,
    Maison et al. 2010): hybrid of Flather radiation with an upstream
    free-surface extrapolation Zx and a Courant-number correction.

        Cx = dt2d*sqrt(g*D)*pm_edge
        Zx = (0.5+Cx)*z_b + (0.5-Cx)*z_ghost   (+ correction, Cx > Co)
        u_b = 0.5*((1-Cx)*u_b^n + Cx*u_interior + u_data
                   - sqrt(g/D)*(Zx - z_data))
    with Co = 1/(2+sqrt(2)) (mod_scalars.F:4435)."""
    obc = obc or {}
    g = cfg.g
    Co = 1.0 / (2.0 + jnp.sqrt(2.0))

    def edge(f, vel_data, z_data, side):
        fo = _orient(f, side)
        ho = _orient(grid.h, side)
        zo = _orient(z_old, side)
        zn = _orient(z_new, side)
        pmo = _orient(grid.pm if side in ("west", "east") else grid.pn,
                      side)
        D = 0.5 * (ho[..., :, -1] + zo[..., :, -1]
                   + ho[..., :, -2] + zo[..., :, -2])
        cg = jnp.sqrt(g / D)
        Cx = dt2d * cg * D * 0.5 * (pmo[..., :, -1] + pmo[..., :, -2])
        Zx = (0.5 + Cx) * zo[..., :, -1] + (0.5 - Cx) * zo[..., :, -2]
        corr = (1.0 - Co / jnp.maximum(Cx, Co)) ** 2 * (
            zn[..., :, -1] + Cx * zo[..., :, -2]
            - (1.0 + Cx) * zo[..., :, -1])
        Zx = Zx + jnp.where(Cx > Co, corr, 0.0)
        ghost = 0.5 * ((1.0 - Cx) * fo[..., :, -1]
                       + Cx * fo[..., :, -2]
                       + vel_data - cg * (Zx - z_data))
        return _restore(fo.at[..., :, -1].set(ghost), side)

    zdat = obc.get("zeta", {})
    udat = obc.get("ubar", {})
    vdat = obc.get("vbar", {})
    for side in ("west", "east"):
        if getattr(cfg.bc.ubar, side) == SHCHEPETKIN:
            ubar_new = edge(ubar_new, udat.get(side, 0.0),
                            zdat.get(side, 0.0), side)
            if side == "west":
                ubar_new = ubar_new.at[..., :, 1].set(
                    ubar_new[..., :, 0])
    for side in ("south", "north"):
        if getattr(cfg.bc.vbar, side) == SHCHEPETKIN:
            vbar_new = edge(vbar_new, vdat.get(side, 0.0),
                            zdat.get(side, 0.0), side)
            if side == "south":
                vbar_new = vbar_new.at[..., 1, :].set(
                    vbar_new[..., 0, :])
    return ubar_new, vbar_new


def _radiation_3d_blocked(cfg, lbc, f_new, f_old, dt, data,
                          stagger, tau_in, tau_out, ctx):
    """radiation_3d under a BlockCtx: the u-west/v-south wall point
    (global index 1) hosts the radiation value, duplicated into the
    ghost (the oriented kernel's drop+copy)."""
    for side in ("west", "south", "east", "north"):
        if getattr(lbc, side) != RADIATION:
            continue
        nud = side in lbc.nudge
        drop = (stagger == "u" and side == "west") or \
               (stagger == "v" and side == "south")
        sd = _Side(ctx, side)
        ghost = _radiation_blocked(
            sd, f_new, f_old, data=data.get(side), dt=dt,
            tau_in=tau_in if nud else 0.0,
            tau_out=tau_out if nud else 0.0)
        if drop:
            f_new = sd.setg(f_new, ghost, offset=1)
            f_new = sd.setg(f_new, sd.inw(ghost, 1), offset=0)
        else:
            f_new = sd.setg(f_new, ghost)
    return f_new


def radiation_3d(cfg: ModelConfig, lbc: LBC, f_new, f_old, dt=None,
                 data=None, stagger: str = "r", tau_in: float = 0.0,
                 tau_out: float = 0.0):
    """Oblique radiation for 2-D/3-D fields (t3dbc_im.F / u3dbc_im.F /
    v3dbc_im.F pattern), applied after the closed/gradient pass.

    stagger: 'r' (rho/zeta/tracer), 'u', or 'v'.  For a U-field the
    western boundary point is column 1 (the normal-flow wall point),
    matching the reference's IstrU-1 indexing; likewise row 1 for a
    V-field at the south.

    tau_in/tau_out [1/s]: radiation-nudging rates toward `data` on
    edges listed in lbc.nudge (M3obc_in/out, Tobc_in/out semantics of
    u3dbc_im.F / t3dbc_im.F nudging branches).
    """
    data = data or {}
    from ..parallel import blockctx
    ctx = blockctx.current()
    if ctx is not None:
        return _radiation_3d_blocked(cfg, lbc, f_new, f_old, dt,
                                     data, stagger, tau_in, tau_out,
                                     ctx)
    for side in ("west", "south", "east", "north"):
        if getattr(lbc, side) != RADIATION:
            continue
        nud = side in lbc.nudge
        drop = (stagger == "u" and side == "west") or \
               (stagger == "v" and side == "south")
        fn = _orient(f_new, side)
        fo = _orient(f_old, side)
        if drop:
            fn, fo = fn[..., :-1], fo[..., :-1]
        ghost = _radiation_line(fn, fo, data=data.get(side), dt=dt,
                                tau_in=tau_in if nud else 0.0,
                                tau_out=tau_out if nud else 0.0)
        if drop:
            # boundary value lives at original index 1 of the edge axis
            if side == "west":
                f_new = f_new.at[..., :, 1].set(ghost)
                f_new = f_new.at[..., :, 0].set(ghost)
            else:
                f_new = f_new.at[..., 1, :].set(ghost)
                f_new = f_new.at[..., 0, :].set(ghost)
        else:
            f_new = _restore(fn.at[..., :, -1].set(ghost), side)
    return f_new


def obc_volcons(cfg: ModelConfig, grid, zeta, ubar, vbar, Drhs,
                DUon, DVom):
    """Integral volume conservation across open boundaries
    (obc_volcons.F): compute the net boundary flux per unit boundary
    area and remove it from the boundary mass fluxes.

    Edges come from cfg.bc.volcons; zeta/ubar/vbar at the krhs state.
    """
    edges = cfg.bc.volcons
    if not edges:
        return DUon, DVom
    from ..parallel import blockctx
    ctx = blockctx.current()
    if ctx is not None:
        return _obc_volcons_blocked(cfg, grid, ctx, zeta, ubar, vbar,
                                    Drhs, DUon, DVom)
    area = 0.0
    flux = 0.0
    h = grid.h
    if "west" in edges:
        cff = 0.5 * (zeta[1:-1, 0] + h[1:-1, 0]
                     + zeta[1:-1, 1] + h[1:-1, 1]) * grid.on_u[1:-1, 1]             * grid.umask[1:-1, 1]
        area = area + jnp.sum(cff)
        flux = flux + jnp.sum(cff * ubar[1:-1, 1])
    if "east" in edges:
        cff = 0.5 * (zeta[1:-1, -2] + h[1:-1, -2]
                     + zeta[1:-1, -1] + h[1:-1, -1])             * grid.on_u[1:-1, -1] * grid.umask[1:-1, -1]
        area = area + jnp.sum(cff)
        flux = flux - jnp.sum(cff * ubar[1:-1, -1])
    if "south" in edges:
        cff = 0.5 * (zeta[0, 1:-1] + h[0, 1:-1]
                     + zeta[1, 1:-1] + h[1, 1:-1]) * grid.om_v[1, 1:-1]             * grid.vmask[1, 1:-1]
        area = area + jnp.sum(cff)
        flux = flux + jnp.sum(cff * vbar[1, 1:-1])
    if "north" in edges:
        cff = 0.5 * (zeta[-2, 1:-1] + h[-2, 1:-1]
                     + zeta[-1, 1:-1] + h[-1, 1:-1])             * grid.om_v[-1, 1:-1] * grid.vmask[-1, 1:-1]
        area = area + jnp.sum(cff)
        flux = flux - jnp.sum(cff * vbar[-1, 1:-1])
    xs = flux / area

    if "west" in edges:
        DUon = DUon.at[1:-1, 1].set(
            0.5 * (Drhs[1:-1, 1] + Drhs[1:-1, 0])
            * (ubar[1:-1, 1] - xs) * grid.on_u[1:-1, 1])
    if "east" in edges:
        DUon = DUon.at[1:-1, -1].set(
            0.5 * (Drhs[1:-1, -1] + Drhs[1:-1, -2])
            * (ubar[1:-1, -1] + xs) * grid.on_u[1:-1, -1])
    if "south" in edges:
        DVom = DVom.at[1, 1:-1].set(
            0.5 * (Drhs[1, 1:-1] + Drhs[0, 1:-1])
            * (vbar[1, 1:-1] - xs) * grid.om_v[1, 1:-1])
    if "north" in edges:
        DVom = DVom.at[-1, 1:-1].set(
            0.5 * (Drhs[-1, 1:-1] + Drhs[-2, 1:-1])
            * (vbar[-1, 1:-1] + xs) * grid.om_v[-1, 1:-1])
    return DUon, DVom


def u2dbc_reduced(cfg: ModelConfig, grid, ubar_new, vbar_new,
                  ubar_old, vbar_old, z_old, dt2d, obc=None,
                  red_stress=None):
    """Reduced-physics open boundary (u2dbc_im.F:398-440 and edge
    mirrors): the boundary NORMAL barotropic momentum integrates the
    simplified balance

        d(ubar)/dt = -g dzeta/dx + f*vbar + (sustr - bustr)/D

    with the elevation gradient taken against external data when
    provided (zeta acquire branch), else one-sided.  Tangential
    components keep their configured kinds.  red_stress: optional
    (sustr_eff, svstr_eff, bustr, bvstr) kinematic stresses; the
    stress term is dropped when absent."""
    from ..config import REDUCED
    g = cfg.g
    data_z = (obc or {}).get("zeta", {})

    def stress_term(edge_sl_u, which):
        if red_stress is None:
            return 0.0
        su, sv, bu, bv = red_stress
        if which == "u":
            return su[edge_sl_u] - bu[edge_sl_u]
        return sv[edge_sl_u] - bv[edge_sl_u]

    ub, vb = ubar_new, vbar_new
    # ---- west edge: normal = ubar at i=1 ------------------------------
    if cfg.bc.ubar.west == REDUCED:
        zi = z_old[:, 1]
        zg = data_z.get("west", z_old[:, 0])
        pgr = -g * (zi - zg) * 0.5 * (grid.pm[:, 0] + grid.pm[:, 1])
        vavg = 0.25 * (vbar_old[:, 0] + jnp.roll(vbar_old, -1, 0)[:, 0]
                       + vbar_old[:, 1]
                       + jnp.roll(vbar_old, -1, 0)[:, 1])
        cor = vavg * 0.5 * (grid.f[:, 0] + grid.f[:, 1]) \
            if cfg.uv_cor else 0.0
        D = 0.5 * (grid.h[:, 0] + z_old[:, 0]
                   + grid.h[:, 1] + z_old[:, 1])
        strs = stress_term(jnp.s_[:, 1], "u") / jnp.maximum(D, 0.01)
        ub = ub.at[:, 1].set((ubar_old[:, 1]
                              + dt2d * (pgr + cor + strs))
                             * grid.umask[:, 1])
    # ---- east edge: normal = ubar at i=-1 -----------------------------
    if cfg.bc.ubar.east == REDUCED:
        zi = z_old[:, -2]
        zg = data_z.get("east", z_old[:, -1])
        pgr = -g * (zg - zi) * 0.5 * (grid.pm[:, -1] + grid.pm[:, -2])
        vavg = 0.25 * (vbar_old[:, -1]
                       + jnp.roll(vbar_old, -1, 0)[:, -1]
                       + vbar_old[:, -2]
                       + jnp.roll(vbar_old, -1, 0)[:, -2])
        cor = vavg * 0.5 * (grid.f[:, -1] + grid.f[:, -2]) \
            if cfg.uv_cor else 0.0
        D = 0.5 * (grid.h[:, -1] + z_old[:, -1]
                   + grid.h[:, -2] + z_old[:, -2])
        strs = stress_term(jnp.s_[:, -1], "u") / jnp.maximum(D, 0.01)
        ub = ub.at[:, -1].set((ubar_old[:, -1]
                               + dt2d * (pgr + cor + strs))
                              * grid.umask[:, -1])
    # ---- south edge: normal = vbar at j=1 -----------------------------
    if cfg.bc.vbar.south == REDUCED:
        zi = z_old[1, :]
        zg = data_z.get("south", z_old[0, :])
        pgr = -g * (zi - zg) * 0.5 * (grid.pn[0, :] + grid.pn[1, :])
        uavg = 0.25 * (ubar_old[0, :] + jnp.roll(ubar_old, -1, 1)[0, :]
                       + ubar_old[1, :]
                       + jnp.roll(ubar_old, -1, 1)[1, :])
        cor = -uavg * 0.5 * (grid.f[0, :] + grid.f[1, :]) \
            if cfg.uv_cor else 0.0
        D = 0.5 * (grid.h[0, :] + z_old[0, :]
                   + grid.h[1, :] + z_old[1, :])
        strs = stress_term(jnp.s_[1, :], "v") / jnp.maximum(D, 0.01)
        vb = vb.at[1, :].set((vbar_old[1, :]
                              + dt2d * (pgr + cor + strs))
                             * grid.vmask[1, :])
    # ---- north edge: normal = vbar at j=-1 ----------------------------
    if cfg.bc.vbar.north == REDUCED:
        zi = z_old[-2, :]
        zg = data_z.get("north", z_old[-1, :])
        pgr = -g * (zg - zi) * 0.5 * (grid.pn[-1, :] + grid.pn[-2, :])
        uavg = 0.25 * (ubar_old[-1, :]
                       + jnp.roll(ubar_old, -1, 1)[-1, :]
                       + ubar_old[-2, :]
                       + jnp.roll(ubar_old, -1, 1)[-2, :])
        cor = -uavg * 0.5 * (grid.f[-1, :] + grid.f[-2, :]) \
            if cfg.uv_cor else 0.0
        D = 0.5 * (grid.h[-1, :] + z_old[-1, :]
                   + grid.h[-2, :] + z_old[-2, :])
        strs = stress_term(jnp.s_[-1, :], "v") / jnp.maximum(D, 0.01)
        vb = vb.at[-1, :].set((vbar_old[-1, :]
                               + dt2d * (pgr + cor + strs))
                              * grid.vmask[-1, :])
    return ub, vb


def _obc_volcons_blocked(cfg: ModelConfig, grid, ctx, zeta, ubar,
                         vbar, Drhs, DUon, DVom):
    """Blocked-engine volume conservation: the boundary-flux and
    boundary-area integrals are local masked sums reduced with a
    SCALAR lax.psum over the (eta, xi) mesh — the TPU analog of
    obc_volcons.F's mp_reduce — and the edge rewrites land through the
    blockctx global-row/column masks on the blocks that own the true
    domain edges."""
    import jax
    from ..ops import stencil as st
    edges = cfg.bc.volcons
    h = grid.h
    if ctx.nghost is None:
        raise ValueError(
            "blocked obc_volcons needs BlockCtx.nghost to mask each "
            "block's OWNED cells out of the halo-duplicated ring")
    ng = ctx.nghost
    nr, nc = zeta.shape[-2:]
    ri = jax.lax.broadcasted_iota(jnp.int32, (nr, nc), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (nr, nc), 1)
    grow = ctx.grow[:, None]
    # each block OWNS its center cells plus — for wall blocks — the
    # domain-ghost line sitting in the first halo ring (from_blocks
    # reconstructs global ghosts from exactly those positions), so
    # halo duplicates never enter the psum twice
    owned_r = ((ri >= ng) & (ri < nr - ng)) \
        | ((ri == ng - 1) & (grow == 0)) \
        | ((ri == nr - ng) & (grow == ctx.Mm + 1))
    if ctx.gcol is not None:
        gcol = ctx.gcol[None, :]
        owned_c = ((ci >= ng) & (ci < nc - ng)) \
            | ((ci == ng - 1) & (gcol == 0)) \
            | ((ci == nc - ng) & (gcol == ctx.Lm + 1))
    else:
        gcol = None
        owned_c = (ci >= ng) & (ci < nc - ng)
    owned = owned_r & owned_c
    interior_row = owned & (grow >= 1) & (grow <= ctx.Mm)
    interior_col = owned if gcol is None else \
        owned & (gcol >= 1) & (gcol <= ctx.Lm)
    if ("west" in edges or "east" in edges) and gcol is None:
        raise ValueError(
            "VolCons on W/E edges needs a walled-xi block layout")

    zero = jnp.zeros_like(zeta)
    area_l = jnp.zeros((), zeta.dtype)
    flux_l = jnp.zeros((), zeta.dtype)
    if "west" in edges:
        # u-point column 1: cff from rho cols 0|1 (im1 within block)
        cff = 0.5 * (zeta + h + st.im1(zeta + h)) * grid.on_u \
            * grid.umask
        m = interior_row & (gcol == 1)
        area_l += jnp.sum(jnp.where(m, cff, zero))
        flux_l += jnp.sum(jnp.where(m, cff * ubar, zero))
    if "east" in edges:
        m = interior_row & (gcol == ctx.Lm + 1)
        cff = 0.5 * (zeta + h + st.im1(zeta + h)) * grid.on_u \
            * grid.umask
        area_l += jnp.sum(jnp.where(m, cff, zero))
        flux_l -= jnp.sum(jnp.where(m, cff * ubar, zero))
    if "south" in edges:
        m = (grow == 1) & interior_col
        cff = 0.5 * (zeta + h + st.jm1(zeta + h)) * grid.om_v \
            * grid.vmask
        area_l += jnp.sum(jnp.where(m, cff, zero))
        flux_l += jnp.sum(jnp.where(m, cff * vbar, zero))
    if "north" in edges:
        m = (grow == ctx.Mm + 1) & interior_col
        cff = 0.5 * (zeta + h + st.jm1(zeta + h)) * grid.om_v \
            * grid.vmask
        area_l += jnp.sum(jnp.where(m, cff, zero))
        flux_l -= jnp.sum(jnp.where(m, cff * vbar, zero))
    area = jax.lax.psum(area_l, axis_name=("eta", "xi"))
    flux = jax.lax.psum(flux_l, axis_name=("eta", "xi"))
    xs = flux / area

    # WRITE masks are id-only (no ownership restriction): every halo
    # copy of an edge cell receives the same corrected value, so no
    # refresh is needed after the rewrite
    irow = (grow >= 1) & (grow <= ctx.Mm)
    if "west" in edges:
        m = irow & (gcol == 1)
        expr = 0.5 * (Drhs + st.im1(Drhs)) * (ubar - xs) * grid.on_u
        DUon = jnp.where(m, expr, DUon)
    if "east" in edges:
        m = irow & (gcol == ctx.Lm + 1)
        expr = 0.5 * (Drhs + st.im1(Drhs)) * (ubar + xs) * grid.on_u
        DUon = jnp.where(m, expr, DUon)
    icol = jnp.ones_like(zeta, bool) if gcol is None else \
        (gcol >= 1) & (gcol <= ctx.Lm)
    if "south" in edges:
        m = (grow == 1) & icol
        expr = 0.5 * (Drhs + st.jm1(Drhs)) * (vbar - xs) * grid.om_v
        DVom = jnp.where(m, expr, DVom)
    if "north" in edges:
        m = (grow == ctx.Mm + 1) & icol
        expr = 0.5 * (Drhs + st.jm1(Drhs)) * (vbar + xs) * grid.om_v
        DVom = jnp.where(m, expr, DVom)
    return DUon, DVom
