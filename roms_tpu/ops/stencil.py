"""Whole-array stencil shift primitives.

Every per-tile DO-loop stencil in the reference becomes a whole-array shifted
expression here.  Shifts use `jnp.roll`, which XLA lowers to cheap fused
slices/concats on TPU; values that wrap across a non-periodic edge land only
in the boundary ring, which is always refreshed by the boundary module after
each kernel — exactly the reference's halo discipline (mp_exchange.F).

Naming: `im1(a)[j, i] == a[j, i-1]` etc.  Axis convention: xi = -1, eta = -2.
"""

from __future__ import annotations

import jax.numpy as jnp


def im1(a):
    return jnp.roll(a, 1, axis=-1)


def ip1(a):
    return jnp.roll(a, -1, axis=-1)


def jm1(a):
    return jnp.roll(a, 1, axis=-2)


def jp1(a):
    return jnp.roll(a, -1, axis=-2)


def ip1jp1(a):
    return jnp.roll(a, (-1, -1), axis=(-2, -1))


def im1jm1(a):
    return jnp.roll(a, (1, 1), axis=(-2, -1))


def dx_m(a):
    """a[i] - a[i-1]: difference onto U points."""
    return a - im1(a)


def dx_p(a):
    """a[i+1] - a[i]: difference at RHO points from U-point values."""
    return ip1(a) - a


def dy_m(a):
    return a - jm1(a)


def dy_p(a):
    return jp1(a) - a


def avg_x(a):
    """0.5*(a[i-1] + a[i]): rho->u (or u->rho shifted) average."""
    return 0.5 * (a + im1(a))


def avg_xp(a):
    """0.5*(a[i] + a[i+1])."""
    return 0.5 * (a + ip1(a))


def avg_y(a):
    return 0.5 * (a + jm1(a))


def avg_yp(a):
    return 0.5 * (a + jp1(a))


def lap_x(a):
    """a[i-1] - 2 a[i] + a[i+1]."""
    return im1(a) - 2.0 * a + ip1(a)


def lap_y(a):
    return jm1(a) - 2.0 * a + jp1(a)


# ---------------------------------------------------------------------------
# Periodic ghost-ring refresh (exchange_2d.F:250-433 semantics with a
# one-point ring: field(0) = field(Lm), field(Lm+1) = field(1); identical for
# every stagger because all staggers share the period Lm (Mm)).
# ---------------------------------------------------------------------------

def periodic_x(a):
    from ..parallel import blockctx
    ctx = blockctx.current()
    if ctx is not None:
        # blocked xi torus: periodicity is inherent (ghost-free
        # interior decomposition; halos wrap mod Lm)
        assert ctx.xi_periodic, \
            "periodic_x called under a walled-xi block layout"
        return a
    a = a.at[..., 0].set(a[..., -2])
    a = a.at[..., -1].set(a[..., 1])
    return a


def periodic_y(a):
    from ..parallel import blockctx
    if blockctx.current() is not None:
        raise NotImplementedError(
            "blocked eta decomposition supports walled N/S only")
    a = a.at[..., 0, :].set(a[..., -2, :])
    a = a.at[..., -1, :].set(a[..., 1, :])
    return a


# ---------------------------------------------------------------------------
# One-sided clamps at closed/non-periodic edges for private stencil arrays
# (mirrors e.g. pre_step3d.F:415-427: FX(Istr-1,:)=FX(Istr,:) etc.).
# These write the ring so wrapped roll garbage never propagates inward.
# ---------------------------------------------------------------------------

def clamp_west(a, col=1, at=0, src=None):
    """a[..., at] = (src or a)[..., col] at the western edge
    (ctx-aware for walled-xi block layouts)."""
    from ..parallel import blockctx
    ctx = blockctx.current()
    if ctx is not None:
        if ctx.xi_periodic:
            raise NotImplementedError(
                "clamp_west under blocked xi torus")
        return blockctx.clamp_west_blocked(a, ctx, col=col, at=at,
                                           src=src)
    return a.at[..., at].set((a if src is None else src)[..., col])


def clamp_east(a, col=-2, at=-1, src=None):
    from ..parallel import blockctx
    ctx = blockctx.current()
    if ctx is not None:
        if ctx.xi_periodic:
            raise NotImplementedError(
                "clamp_east under blocked xi torus")
        return blockctx.clamp_east_blocked(a, ctx, col=col, at=at,
                                           src=src)
    return a.at[..., at].set((a if src is None else src)[..., col])


def zero_west(a, at=0):
    """a[..., at global col] = 0 at the western wall (ctx-aware)."""
    from ..parallel import blockctx
    ctx = blockctx.current()
    if ctx is not None and not ctx.xi_periodic:
        return blockctx.zero_col_blocked(a, ctx, at if at >= 0
                                         else ctx.Lm + 2 + at)
    if ctx is not None:
        raise NotImplementedError("zero_west under blocked xi torus")
    return a.at[..., at].set(0.0)


def zero_east(a, at=-1):
    from ..parallel import blockctx
    ctx = blockctx.current()
    if ctx is not None and not ctx.xi_periodic:
        return blockctx.zero_col_blocked(a, ctx, at if at >= 0
                                         else ctx.Lm + 2 + at)
    if ctx is not None:
        raise NotImplementedError("zero_east under blocked xi torus")
    return a.at[..., at].set(0.0)


def clamp_south(a, row=1, at=0, src=None):
    """a[at] = (src or a)[row] (one-sided clamp at the southern edge;
    `at` and `row` are GLOBAL eta indices, e.g. at=1,row=2 for V-point
    private arrays)."""
    from ..parallel import blockctx
    ctx = blockctx.current()
    if ctx is not None:
        return blockctx.clamp_south_blocked(a, ctx, row=row, at=at,
                                            src=src)
    return a.at[..., at, :].set((a if src is None else src)[..., row, :])


def clamp_north(a, row=-2, at=-1, src=None):
    from ..parallel import blockctx
    ctx = blockctx.current()
    if ctx is not None:
        return blockctx.clamp_north_blocked(a, ctx, row=row, at=at,
                                            src=src)
    return a.at[..., at, :].set((a if src is None else src)[..., row, :])


def zero_south(a, at=0):
    """a[at global row] = 0 at the southern wall (ctx-aware)."""
    from ..parallel import blockctx
    ctx = blockctx.current()
    if ctx is not None:
        return blockctx.zero_row_blocked(a, ctx, at if at >= 0
                                         else ctx.Mm + 2 + at)
    return a.at[..., at, :].set(0.0)


def zero_north(a, at=-1):
    from ..parallel import blockctx
    ctx = blockctx.current()
    if ctx is not None:
        return blockctx.zero_row_blocked(a, ctx, at if at >= 0
                                         else ctx.Mm + 2 + at)
    return a.at[..., at, :].set(0.0)
