"""Lateral boundary conditions.

Re-implements the reference's per-variable, per-edge boundary dispatch
(ROMS/Nonlinear/zetabc.F, u2dbc_im.F, v2dbc_im.F, u3dbc_im.F, v3dbc_im.F,
t3dbc_im.F and the periodic exchange_2d/3d.F) as whole-array ring updates.

Because scheme selection is static (ModelConfig is a jit-static argument),
the XLA program contains only the selected edge updates — the runtime
"if LBC(...)%closed" forest of the reference becomes trace-time Python.

Conventions (see roms_tpu.grid.grid): fields are [..., j, i] with the ring
at j,i ∈ {0, -1}.  For U-fields the western boundary u-point is column 1
(reference i=Istr); for V-fields the southern boundary v-point is row 1.

This module holds the closed/gradient/clamped/periodic families; the
open families (radiation with nudging, Flather, Shchepetkin, Chapman
explicit/implicit, reduced) live in core.obc and are applied after this
pass.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..config import (LBC, PERIODIC, CLOSED, GRADIENT, CLAMPED)
from ..ops import stencil as st


def _corners(f):
    """Average the ring corners from their two edge neighbors
    (matches the reference's bc_2d.F corner treatment)."""
    f = f.at[..., 0, 0].set(0.5 * (f[..., 1, 0] + f[..., 0, 1]))
    f = f.at[..., 0, -1].set(0.5 * (f[..., 1, -1] + f[..., 0, -2]))
    f = f.at[..., -1, 0].set(0.5 * (f[..., -2, 0] + f[..., -1, 1]))
    f = f.at[..., -1, -1].set(0.5 * (f[..., -2, -1] + f[..., -1, -2]))
    return f


def _apply_periodic(f, lbc: LBC):
    if lbc.west == PERIODIC:
        f = st.periodic_x(f)
    if lbc.south == PERIODIC:
        f = st.periodic_y(f)
    return f


def bc_rho(f, lbc: LBC, bdata: Optional[dict] = None):
    """BCs for a RHO-point field (zeta, tracers, W, rho).

    closed == gradient for rho fields (zetabc.F:562-586 south closed/gradient
    are identical: ghost = interior neighbor)."""
    from ..parallel import blockctx
    ctx = blockctx.current()
    if ctx is not None:
        return blockctx.bc_rho_blocked(f, lbc, ctx, bdata)
    bd = bdata or {}
    if lbc.west in (CLOSED, GRADIENT):
        f = f.at[..., :, 0].set(f[..., :, 1])
    elif lbc.west == CLAMPED:
        f = f.at[..., :, 0].set(bd["west"] if "west" in bd
                                else f[..., :, 1])
    if lbc.east in (CLOSED, GRADIENT):
        f = f.at[..., :, -1].set(f[..., :, -2])
    elif lbc.east == CLAMPED:
        f = f.at[..., :, -1].set(bd["east"] if "east" in bd
                                 else f[..., :, -2])
    if lbc.south in (CLOSED, GRADIENT):
        f = f.at[..., 0, :].set(f[..., 1, :])
    elif lbc.south == CLAMPED:
        f = f.at[..., 0, :].set(bd["south"] if "south" in bd
                                else f[..., 1, :])
    if lbc.north in (CLOSED, GRADIENT):
        f = f.at[..., -1, :].set(f[..., -2, :])
    elif lbc.north == CLAMPED:
        f = f.at[..., -1, :].set(bd["north"] if "north" in bd
                                 else f[..., -2, :])
    f = _apply_periodic(f, lbc)
    if lbc.west != PERIODIC and lbc.south != PERIODIC:
        f = _corners(f)
    return f


def bc_u(f, lbc: LBC, gamma2: float = 1.0, bdata: Optional[dict] = None):
    """BCs for a U-point field (ubar, u).

    West/east are the flow-normal edges: closed sets the wall u-point to
    zero (u2dbc_im.F western closed); gradient copies the neighbor.
    South/north are tangential: closed writes the ghost row with
    gamma2 * interior (u2dbc_im.F:974-994)."""
    from ..parallel import blockctx
    ctx = blockctx.current()
    if ctx is not None:
        return blockctx.bc_u_blocked(f, lbc, ctx, gamma2, bdata)
    bd = bdata or {}
    if lbc.west == CLOSED:
        f = f.at[..., :, 1].set(0.0)
        f = f.at[..., :, 0].set(0.0)
    elif lbc.west == GRADIENT:
        f = f.at[..., :, 1].set(f[..., :, 2])
        f = f.at[..., :, 0].set(f[..., :, 2])
    elif lbc.west == CLAMPED:
        val = bd["west"] if "west" in bd else f[..., :, 2]
        f = f.at[..., :, 1].set(val)
        f = f.at[..., :, 0].set(val)
    if lbc.east == CLOSED:
        f = f.at[..., :, -1].set(0.0)
    elif lbc.east == GRADIENT:
        f = f.at[..., :, -1].set(f[..., :, -2])
    elif lbc.east == CLAMPED:
        f = f.at[..., :, -1].set(bd["east"] if "east" in bd
                                 else f[..., :, -2])
    if lbc.south == CLOSED:
        f = f.at[..., 0, :].set(gamma2 * f[..., 1, :])
    elif lbc.south == GRADIENT:
        f = f.at[..., 0, :].set(f[..., 1, :])
    elif lbc.south == CLAMPED:
        f = f.at[..., 0, :].set(bd["south"] if "south" in bd
                                else f[..., 1, :])
    if lbc.north == CLOSED:
        f = f.at[..., -1, :].set(gamma2 * f[..., -2, :])
    elif lbc.north == GRADIENT:
        f = f.at[..., -1, :].set(f[..., -2, :])
    elif lbc.north == CLAMPED:
        f = f.at[..., -1, :].set(bd["north"] if "north" in bd
                                 else f[..., -2, :])
    f = _apply_periodic(f, lbc)
    if lbc.west != PERIODIC and lbc.south != PERIODIC:
        f = _corners(f)
    return f


def bc_v(f, lbc: LBC, gamma2: float = 1.0, bdata: Optional[dict] = None):
    """BCs for a V-point field (vbar, v) — mirror of bc_u."""
    from ..parallel import blockctx
    ctx = blockctx.current()
    if ctx is not None:
        return blockctx.bc_v_blocked(f, lbc, ctx, gamma2, bdata)
    bd = bdata or {}
    if lbc.south == CLOSED:
        f = f.at[..., 1, :].set(0.0)
        f = f.at[..., 0, :].set(0.0)
    elif lbc.south == GRADIENT:
        f = f.at[..., 1, :].set(f[..., 2, :])
        f = f.at[..., 0, :].set(f[..., 2, :])
    elif lbc.south == CLAMPED:
        val = bd["south"] if "south" in bd else f[..., 2, :]
        f = f.at[..., 1, :].set(val)
        f = f.at[..., 0, :].set(val)
    if lbc.north == CLOSED:
        f = f.at[..., -1, :].set(0.0)
    elif lbc.north == GRADIENT:
        f = f.at[..., -1, :].set(f[..., -2, :])
    elif lbc.north == CLAMPED:
        f = f.at[..., -1, :].set(bd["north"] if "north" in bd
                                 else f[..., -2, :])
    if lbc.west == CLOSED:
        f = f.at[..., :, 0].set(gamma2 * f[..., :, 1])
    elif lbc.west == GRADIENT:
        f = f.at[..., :, 0].set(f[..., :, 1])
    elif lbc.west == CLAMPED:
        f = f.at[..., :, 0].set(bd["west"] if "west" in bd
                                else f[..., :, 1])
    if lbc.east == CLOSED:
        f = f.at[..., :, -1].set(gamma2 * f[..., :, -2])
    elif lbc.east == GRADIENT:
        f = f.at[..., :, -1].set(f[..., :, -2])
    elif lbc.east == CLAMPED:
        f = f.at[..., :, -1].set(bd["east"] if "east" in bd
                                 else f[..., :, -2])
    f = _apply_periodic(f, lbc)
    if lbc.west != PERIODIC and lbc.south != PERIODIC:
        f = _corners(f)
    return f
