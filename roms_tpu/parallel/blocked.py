"""Device-side 2-D (eta, xi) block decomposition with halo rings.

The production layout for the explicit-halo engine (VERDICT round-3
item 2): state fields live PERMANENTLY as per-shard blocks with
nghost-wide halo rings — blocking/unblocking happens on device via
static gathers (one `jnp.take` per axis), not host numpy round-trips.

Layout per field (..., Mj, Li) -> (..., neta*BJ, nxi*BI) with
BJ = Mm/neta + 2*nghost, BI = Lm/nxi + 2*nghost:

  - xi: ghost-free periodic torus over the Lm interior columns
    (stencil.periodic_x ghost copies become inherent wraps; the global
    ring is reconstructed on unblocking);
  - eta: the Mm interior rows split over neta; halo rows BEYOND the
    physical ghost rows (global 0 / Mm+1) clamp to those rows, so the
    wall blocks' rings always hold boundary-condition data.

`grow` gives each block row's global eta index (sharded along eta) —
the key consumed by parallel.blockctx to apply boundary writes at
physical walls only.  The halo refresh is the two-phase W/E-then-N/S
ppermute exchange of mp_exchange.F:520-773 with no wrap links on the
walled eta axis.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


class BlockLayout(NamedTuple):
    neta: int
    nxi: int
    nghost: int
    Mm: int
    Lm: int
    xi_periodic: bool = True

    @property
    def bj(self) -> int:
        return self.Mm // self.neta

    @property
    def bi(self) -> int:
        return self.Lm // self.nxi

    @property
    def BJ(self) -> int:
        return self.bj + 2 * self.nghost

    @property
    def BI(self) -> int:
        return self.bi + 2 * self.nghost


def make_layout(cfg, mesh: Mesh, nghost: int) -> BlockLayout:
    neta, nxi = mesh.shape["eta"], mesh.shape["xi"]
    if cfg.Mm % neta or cfg.Lm % nxi:
        raise ValueError(
            f"grid {cfg.Mm}x{cfg.Lm} not divisible by mesh "
            f"({neta},{nxi})")
    return BlockLayout(neta, nxi, nghost, cfg.Mm, cfg.Lm,
                       xi_periodic=bool(cfg.bc.ew_periodic))


def _eta_index(lay: BlockLayout) -> np.ndarray:
    """Global row index per blocked row (neta*BJ,), halos clamped to
    the physical ghost rows."""
    idx = []
    for jb in range(lay.neta):
        g = np.arange(jb * lay.bj + 1 - lay.nghost,
                      (jb + 1) * lay.bj + 1 + lay.nghost)
        idx.append(np.clip(g, 0, lay.Mm + 1))
    return np.concatenate(idx)


def _xi_index(lay: BlockLayout) -> np.ndarray:
    """Global col index per blocked col (nxi*BI,): periodic mod Lm
    over the interior columns 1..Lm for the torus layout; clamped to
    the physical ghost columns (0 / Lm+1) for walled xi (same
    discipline as the eta axis)."""
    idx = []
    for ib in range(lay.nxi):
        if lay.xi_periodic:
            g = np.arange(ib * lay.bi - lay.nghost,
                          (ib + 1) * lay.bi + lay.nghost) % lay.Lm + 1
        else:
            g = np.clip(np.arange(ib * lay.bi + 1 - lay.nghost,
                                  (ib + 1) * lay.bi + 1 + lay.nghost),
                        0, lay.Lm + 1)
        idx.append(g)
    return np.concatenate(idx)


def grow_array(lay: BlockLayout) -> jnp.ndarray:
    """(neta*BJ,) int32 global row index of every blocked row —
    shard along 'eta' so each device sees its own block's indices."""
    return jnp.asarray(_eta_index(lay), jnp.int32)


def gcol_array(lay: BlockLayout) -> jnp.ndarray:
    """(nxi*BI,) int32 global col index of every blocked col (walled
    xi layouts) — shard along 'xi'."""
    return jnp.asarray(_xi_index(lay), jnp.int32)


def to_blocks_line_xi(f, lay: BlockLayout):
    """Block a boundary LINE along xi (south/north obc data,
    (..., Li) -> (..., nxi*BI))."""
    return jnp.take(jnp.asarray(f), jnp.asarray(_xi_index(lay)),
                    axis=-1)


def to_blocks_line_eta(f, lay: BlockLayout):
    """Block a boundary LINE along eta (west/east obc data,
    (..., Mj) -> (..., neta*BJ))."""
    return jnp.take(jnp.asarray(f), jnp.asarray(_eta_index(lay)),
                    axis=-1)


def to_blocks(f, lay: BlockLayout):
    """(..., Mj, Li) -> blocked (..., neta*BJ, nxi*BI); pure gathers,
    jit-safe, device-resident."""
    f = jnp.take(f, jnp.asarray(_eta_index(lay)), axis=-2)
    return jnp.take(f, jnp.asarray(_xi_index(lay)), axis=-1)


def from_blocks(fb, lay: BlockLayout):
    """Blocked -> global (..., Mj, Li): drop halos, reassemble, rebuild
    the global xi periodic ghost ring."""
    parts = []
    for jb in range(lay.neta):
        row0 = jb * lay.BJ + lay.nghost
        cols = []
        for ib in range(lay.nxi):
            c0 = ib * lay.BI + lay.nghost
            cols.append(lax.slice_in_dim(
                lax.slice_in_dim(fb, row0, row0 + lay.bj, axis=-2),
                c0, c0 + lay.bi, axis=-1))
        parts.append(jnp.concatenate(cols, axis=-1))
    interior = jnp.concatenate(parts, axis=-2)          # (Mm, Lm)
    # physical ghost rows come from the wall blocks' rings
    south = jnp.take(fb, jnp.asarray([lay.nghost - 1]), axis=-2)
    north = jnp.take(
        fb, jnp.asarray([(lay.neta - 1) * lay.BJ + lay.nghost
                         + lay.bj]), axis=-2)

    def xi_reassemble(row_blk):
        cols = [lax.slice_in_dim(row_blk, ib * lay.BI + lay.nghost,
                                 ib * lay.BI + lay.nghost + lay.bi,
                                 axis=-1)
                for ib in range(lay.nxi)]
        return jnp.concatenate(cols, axis=-1)

    full = jnp.concatenate(
        [xi_reassemble(south), interior, xi_reassemble(north)],
        axis=-2)                                        # (Mj, Lm)
    if lay.xi_periodic:
        west = lax.slice_in_dim(full, lay.Lm - 1, lay.Lm, axis=-1)
        east = lax.slice_in_dim(full, 0, 1, axis=-1)
        return jnp.concatenate([west, full, east], axis=-1)

    # walled xi: the physical ghost columns live in the wall blocks'
    # rings (same as the eta ghost rows)
    def col_from_blocks(ib, col_in_block):
        c = ib * lay.BI + col_in_block
        parts = []
        for jb in range(lay.neta):
            r0 = jb * lay.BJ + lay.nghost
            parts.append(lax.slice_in_dim(
                lax.slice_in_dim(fb, r0, r0 + lay.bj, axis=-2),
                c, c + 1, axis=-1))
        col = jnp.concatenate(parts, axis=-2)           # (Mm, 1)
        s_g = lax.slice_in_dim(lax.slice_in_dim(
            fb, lay.nghost - 1, lay.nghost, axis=-2), c, c + 1,
            axis=-1)
        n_g = lax.slice_in_dim(lax.slice_in_dim(
            fb, (lay.neta - 1) * lay.BJ + lay.nghost + lay.bj,
            (lay.neta - 1) * lay.BJ + lay.nghost + lay.bj + 1,
            axis=-2), c, c + 1, axis=-1)
        return jnp.concatenate([s_g, col, n_g], axis=-2)  # (Mj, 1)

    west = col_from_blocks(0, lay.nghost - 1)
    east = col_from_blocks(lay.nxi - 1, lay.nghost + lay.bi)
    return jnp.concatenate([west, full, east], axis=-1)


# ---------------------------------------------------------------------------
# Two-phase halo refresh (runs INSIDE shard_map on per-device blocks)
# ---------------------------------------------------------------------------

def _perms(n, wrap):
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]
    if wrap:
        fwd.append((n - 1, 0))
        bwd.append((0, n - 1))
    return fwd, bwd


def refresh_block(f, lay: BlockLayout, mesh_axes=("eta", "xi")):
    """Refresh the halo ring of one per-device block (..., BJ, BI):
    W/E exchange first, then N/S including the fresh ghost columns
    (mp_exchange.F:520-773 two-phase corner discipline).  The eta axis
    has NO wrap links — the wall blocks keep their outer rings (the
    physical boundary rows maintained by blockctx)."""
    g = lay.nghost
    eta_ax, xi_ax = mesh_axes
    if lay.xi_periodic or lay.nxi > 1:
        fwd, bwd = _perms(lay.nxi, wrap=lay.xi_periodic)
        BI = f.shape[-1]
        east = lax.slice_in_dim(f, BI - 2 * g, BI - g, axis=-1)
        west = lax.slice_in_dim(f, g, 2 * g, axis=-1)
        from_west = lax.ppermute(east, xi_ax, fwd)
        from_east = lax.ppermute(west, xi_ax, bwd)
        if not lay.xi_periodic:
            # wall blocks received zeros on the unlinked side: keep
            # the old ring (the BC-maintained boundary columns)
            ib = lax.axis_index(xi_ax)
            old_w = lax.slice_in_dim(f, 0, g, axis=-1)
            old_e = lax.slice_in_dim(f, BI - g, BI, axis=-1)
            from_west = jnp.where(ib == 0, old_w, from_west)
            from_east = jnp.where(ib == lay.nxi - 1, old_e,
                                  from_east)
        f = lax.dynamic_update_slice_in_dim(f, from_west, 0,
                                            axis=f.ndim - 1)
        f = lax.dynamic_update_slice_in_dim(f, from_east, BI - g,
                                            axis=f.ndim - 1)
    if lay.neta > 1:
        fwd, bwd = _perms(lay.neta, wrap=False)
        BJ = f.shape[-2]
        north = lax.slice_in_dim(f, BJ - 2 * g, BJ - g, axis=-2)
        south = lax.slice_in_dim(f, g, 2 * g, axis=-2)
        from_south = lax.ppermute(north, eta_ax, fwd)
        from_north = lax.ppermute(south, eta_ax, bwd)
        jb = lax.axis_index(eta_ax)
        # wall blocks received zeros on the unlinked side: keep the
        # old ring there (it holds the BC-maintained boundary rows)
        old_s = lax.slice_in_dim(f, 0, g, axis=-2)
        old_n = lax.slice_in_dim(f, BJ - g, BJ, axis=-2)
        from_south = jnp.where(jb == 0, old_s, from_south)
        from_north = jnp.where(jb == lay.neta - 1, old_n, from_north)
        f = lax.dynamic_update_slice_in_dim(f, from_south, 0,
                                            axis=f.ndim - 2)
        f = lax.dynamic_update_slice_in_dim(f, from_north, BJ - g,
                                            axis=f.ndim - 2)
    return f
