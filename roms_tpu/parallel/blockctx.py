"""Trace-time block context: makes the whole-array core kernels
block-correct inside shard_map.

The core computes stencils with `jnp.roll` (torus semantics) and fixes
boundaries with fixed-index writes (`f.at[..., 0, :].set(...)`,
boundary.bc_*, stencil.clamp_*, stencil.periodic_*).  Under a 2-D
(eta, xi) shard decomposition each device holds one block with an
nghost-wide halo ring:

  - rolls are automatically exact (halos supply true neighbor values,
    the mp_exchange.F discipline);
  - fixed-index writes would land on BLOCK edges instead of DOMAIN
    edges.  With a BlockCtx active, those writes become masked updates
    keyed on the block's global row-index array `grow` (sharded, one
    value per block row), so only the device owning a physical
    boundary row applies its boundary condition — at the right place,
    every time, exactly as the global trace does.

The context is consulted at TRACE time (plain Python), so unsharded
traces pay nothing.  Supported domain class: EW-periodic, N/S
closed/gradient/clamped walls (the BENCHMARK/UPWELLING channel family
— xi is decomposed as a ghost-free torus where periodicity is inherent
and `periodic_x` becomes the identity).
"""

from __future__ import annotations

import contextlib
import threading
from typing import NamedTuple, Optional

import jax.numpy as jnp

_state = threading.local()


class BlockCtx(NamedTuple):
    """grow: (block_rows,) int32 global eta index of every block row
    (0 = south physical ghost row, Mm+1 = north ghost; halo rows
    outside the domain are clamped to those values).  Mm: interior
    rows.  For walled-xi layouts (xi_periodic=False), gcol is the
    column counterpart (0 = west ghost, Lm+1 = east ghost) and
    fixed-column boundary writes become masked updates too."""
    grow: jnp.ndarray
    Mm: int
    gcol: jnp.ndarray = None
    Lm: int = 0
    xi_periodic: bool = True
    # halo-ring width of the block layout; lets ctx-aware REDUCTIONS
    # (obc_volcons) mask each block to its OWNED center cells so halo
    # copies are not double-counted in psums.  None = unknown.
    nghost: Optional[int] = None


def current() -> Optional[BlockCtx]:
    return getattr(_state, "ctx", None)


@contextlib.contextmanager
def block_ctx(ctx: BlockCtx):
    prev = getattr(_state, "ctx", None)
    _state.ctx = ctx
    try:
        yield
    finally:
        _state.ctx = prev


def _row_mask(ctx: BlockCtx, g: int):
    """(rows, 1) bool mask of block rows holding global row g."""
    return (ctx.grow == g)[:, None]


def _set_row(f, ctx, g, value):
    """f[global row g] = value (value aligned with f's rows)."""
    return jnp.where(_row_mask(ctx, g), value, f)


def _col_mask(ctx: BlockCtx, g: int):
    """(cols,) bool mask of block cols holding global col g."""
    return ctx.gcol == g


def _set_col(f, ctx, g, value):
    """f[..., global col g] = value (value aligned with f's cols,
    or (..., rows) line data broadcast with a trailing axis)."""
    if hasattr(value, "ndim") and value.ndim == f.ndim - 1:
        value = value[..., None]
    return jnp.where(_col_mask(ctx, g), value, f)


def _jp1(a):
    return jnp.roll(a, -1, axis=-2)


def _jm1(a):
    return jnp.roll(a, 1, axis=-2)


def _ip1(a):
    return jnp.roll(a, -1, axis=-1)


def _im1(a):
    return jnp.roll(a, 1, axis=-1)


def _corners_blocked(f, ctx: BlockCtx):
    """bc_2d.F corner treatment under blocks: the four domain-corner
    ghost points average their two edge neighbors."""
    Mn, Ln = ctx.Mm + 1, ctx.Lm + 1
    for gr, gc, nj, ni in ((0, 0, _jp1, _ip1), (0, Ln, _jp1, _im1),
                           (Mn, 0, _jm1, _ip1), (Mn, Ln, _jm1, _im1)):
        m = _row_mask(ctx, gr) & _col_mask(ctx, gc)
        f = jnp.where(m, 0.5 * (nj(f) + ni(f)), f)
    return f


# ---------------------------------------------------------------------------
# Masked equivalents of core.boundary bc_* for the N/S wall family.
# E/W edges must be periodic in this class (inherent in the torus).
# ---------------------------------------------------------------------------

def bc_rho_blocked(f, lbc, ctx: BlockCtx, bdata=None):
    from ..config import CLAMPED, CLOSED, GRADIENT, PERIODIC
    bd = bdata or {}
    if ctx.xi_periodic:
        assert lbc.west == PERIODIC and lbc.east == PERIODIC, \
            "torus-xi block context requires EW-periodic LBCs"
    else:
        assert lbc.west != PERIODIC and lbc.east != PERIODIC
        if lbc.west in (CLOSED, GRADIENT) or (
                lbc.west == CLAMPED and "west" not in bd):
            f = _set_col(f, ctx, 0, _ip1(f))
        elif lbc.west == CLAMPED:
            f = _set_col(f, ctx, 0, bd["west"])
        if lbc.east in (CLOSED, GRADIENT) or (
                lbc.east == CLAMPED and "east" not in bd):
            f = _set_col(f, ctx, ctx.Lm + 1, _im1(f))
        elif lbc.east == CLAMPED:
            f = _set_col(f, ctx, ctx.Lm + 1, bd["east"])
    if lbc.south in (CLOSED, GRADIENT) or (
            lbc.south == CLAMPED and "south" not in bd):
        f = _set_row(f, ctx, 0, _jp1(f))
    elif lbc.south == CLAMPED:
        f = _set_row(f, ctx, 0, bd["south"])
    if lbc.north in (CLOSED, GRADIENT) or (
            lbc.north == CLAMPED and "north" not in bd):
        f = _set_row(f, ctx, ctx.Mm + 1, _jm1(f))
    elif lbc.north == CLAMPED:
        f = _set_row(f, ctx, ctx.Mm + 1, bd["north"])
    if not ctx.xi_periodic:
        f = _corners_blocked(f, ctx)
    return f


def bc_u_blocked(f, lbc, ctx: BlockCtx, gamma2=1.0, bdata=None):
    from ..config import CLAMPED, CLOSED, GRADIENT, PERIODIC
    bd = bdata or {}
    if ctx.xi_periodic:
        assert lbc.west == PERIODIC and lbc.east == PERIODIC
    else:
        assert lbc.west != PERIODIC and lbc.east != PERIODIC
        # west/east are the flow-normal edges for U (u2dbc_im.F):
        # wall u-point is global col 1; ghost col 0
        if lbc.west == CLOSED:
            f = _set_col(f, ctx, 1, jnp.zeros_like(f))
            f = _set_col(f, ctx, 0, jnp.zeros_like(f))
        elif lbc.west == GRADIENT or (lbc.west == CLAMPED
                                      and "west" not in bd):
            f = _set_col(f, ctx, 1, _ip1(f))
            f = _set_col(f, ctx, 0, jnp.roll(f, -2, axis=-1))
        elif lbc.west == CLAMPED:
            f = _set_col(f, ctx, 1, bd["west"])
            f = _set_col(f, ctx, 0, bd["west"])
        if lbc.east == CLOSED:
            f = _set_col(f, ctx, ctx.Lm + 1, jnp.zeros_like(f))
        elif lbc.east == GRADIENT or (lbc.east == CLAMPED
                                      and "east" not in bd):
            f = _set_col(f, ctx, ctx.Lm + 1, _im1(f))
        elif lbc.east == CLAMPED:
            f = _set_col(f, ctx, ctx.Lm + 1, bd["east"])
    if lbc.south == CLOSED:
        f = _set_row(f, ctx, 0, gamma2 * _jp1(f))
    elif lbc.south == GRADIENT or (lbc.south == CLAMPED
                                   and "south" not in bd):
        f = _set_row(f, ctx, 0, _jp1(f))
    elif lbc.south == CLAMPED:
        f = _set_row(f, ctx, 0, bd["south"])
    if lbc.north == CLOSED:
        f = _set_row(f, ctx, ctx.Mm + 1, gamma2 * _jm1(f))
    elif lbc.north == GRADIENT or (lbc.north == CLAMPED
                                   and "north" not in bd):
        f = _set_row(f, ctx, ctx.Mm + 1, _jm1(f))
    elif lbc.north == CLAMPED:
        f = _set_row(f, ctx, ctx.Mm + 1, bd["north"])
    if not ctx.xi_periodic:
        f = _corners_blocked(f, ctx)
    return f


def bc_v_blocked(f, lbc, ctx: BlockCtx, gamma2=1.0, bdata=None):
    from ..config import CLAMPED, CLOSED, GRADIENT, PERIODIC
    bd = bdata or {}
    if ctx.xi_periodic:
        assert lbc.west == PERIODIC and lbc.east == PERIODIC
    else:
        assert lbc.west != PERIODIC and lbc.east != PERIODIC
        # west/east are tangential for V: ghost col writes
        if lbc.west == CLOSED:
            f = _set_col(f, ctx, 0, gamma2 * _ip1(f))
        elif lbc.west == GRADIENT or (lbc.west == CLAMPED
                                      and "west" not in bd):
            f = _set_col(f, ctx, 0, _ip1(f))
        elif lbc.west == CLAMPED:
            f = _set_col(f, ctx, 0, bd["west"])
        if lbc.east == CLOSED:
            f = _set_col(f, ctx, ctx.Lm + 1, gamma2 * _im1(f))
        elif lbc.east == GRADIENT or (lbc.east == CLAMPED
                                      and "east" not in bd):
            f = _set_col(f, ctx, ctx.Lm + 1, _im1(f))
        elif lbc.east == CLAMPED:
            f = _set_col(f, ctx, ctx.Lm + 1, bd["east"])
    if lbc.south == CLOSED:
        f = _set_row(f, ctx, 1, jnp.zeros_like(f))
        f = _set_row(f, ctx, 0, jnp.zeros_like(f))
    elif lbc.south == GRADIENT or (lbc.south == CLAMPED
                                   and "south" not in bd):
        # v(1) = v(2), v(0) = v(2): at grow==1 take jp1, at grow==0
        # take the value two rows up
        f = _set_row(f, ctx, 1, _jp1(f))
        f = _set_row(f, ctx, 0, jnp.roll(f, -2, axis=-2))
    elif lbc.south == CLAMPED:
        f = _set_row(f, ctx, 1, bd["south"])
        f = _set_row(f, ctx, 0, bd["south"])
    if lbc.north == CLOSED:
        f = _set_row(f, ctx, ctx.Mm + 1, jnp.zeros_like(f))
    elif lbc.north == GRADIENT or (lbc.north == CLAMPED
                                   and "north" not in bd):
        f = _set_row(f, ctx, ctx.Mm + 1, _jm1(f))
    elif lbc.north == CLAMPED:
        f = _set_row(f, ctx, ctx.Mm + 1, bd["north"])
    if not ctx.xi_periodic:
        f = _corners_blocked(f, ctx)
    return f


def clamp_south_blocked(a, ctx: BlockCtx, row: int = 1, at: int = 0,
                        src=None):
    """stencil.clamp_south under the context: global row `at` copies
    (src or a) at global row `row` (both near the southern wall)."""
    b = a if src is None else src
    return _set_row(a, ctx, at, jnp.roll(b, -(row - at), axis=-2))


def clamp_north_blocked(a, ctx: BlockCtx, row: int = -2,
                        at: int = -1, src=None):
    g_at = ctx.Mm + 2 + at          # -1 -> Mm+1
    g_row = ctx.Mm + 2 + row if row < 0 else row
    b = a if src is None else src
    return _set_row(a, ctx, g_at, jnp.roll(b, g_at - g_row, axis=-2))


def zero_row_blocked(a, ctx: BlockCtx, g: int):
    return _set_row(a, ctx, g, jnp.zeros_like(a))


def clamp_west_blocked(a, ctx: BlockCtx, col: int = 1, at: int = 0,
                       src=None):
    """stencil.clamp_west under the context: global col `at` copies
    (src or a) at global col `col` near the western wall."""
    b = a if src is None else src
    return _set_col(a, ctx, at, jnp.roll(b, -(col - at), axis=-1))


def clamp_east_blocked(a, ctx: BlockCtx, col: int = -2, at: int = -1,
                       src=None):
    g_at = ctx.Lm + 2 + at if at < 0 else at
    g_col = ctx.Lm + 2 + col if col < 0 else col
    b = a if src is None else src
    return _set_col(a, ctx, g_at, jnp.roll(b, g_at - g_col, axis=-1))


def zero_col_blocked(a, ctx: BlockCtx, g: int):
    return _set_col(a, ctx, g, jnp.zeros_like(a))
