"""Explicit halo exchange via shard_map + lax.ppermute.

GSPMD partitions the whole-array stencils automatically (see mesh.py
audit: collective-permutes, zero field-sized all-gathers).  This module
provides the EXPLICIT alternative — the direct analog of the
reference's mp_exchange2d/3d (mp_exchange.F:290-333): fields carry an
Nghost-wide halo ring per shard, refreshed by neighbor permutes in two
phases (W/E first, then N/S including the just-received ghost columns,
which resolves the corners exactly as mp_exchange.F:520-773 does).
Multiple fields exchange in one call, matching the reference's
aggregate-up-to-4-arrays optimization.

Use when GSPMD's automatic choice is suboptimal: a shard_map region
can hold the fast loop with manual halo refreshes every (widened-halo)
substeps, overlapping permutes against interior compute.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _ring_perm(n):
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    return fwd, bwd


def halo_refresh(fields, mesh: Mesh, nghost: int = 1,
                 periodic=(True, True)):
    """Refresh nghost-wide halo rings of per-shard blocks.

    fields: pytree of arrays whose trailing two axes are the sharded
    (eta, xi) block INCLUDING the halo ring.  Runs inside shard_map —
    call via `exchange = make_halo_exchange(mesh, ...)`.
    """
    neta = mesh.shape["eta"]
    nxi = mesh.shape["xi"]

    def one(f):
        # --- phase 1: west/east along 'xi' --------------------------
        if nxi > 1 or periodic[1]:
            fwd, bwd = _ring_perm(nxi)
            # send my east interior edge to my east neighbor's west halo
            east_edge = lax.slice_in_dim(f, f.shape[-1] - 2 * nghost,
                                         f.shape[-1] - nghost, axis=-1)
            west_edge = lax.slice_in_dim(f, nghost, 2 * nghost, axis=-1)
            from_west = lax.ppermute(east_edge, "xi", fwd)
            from_east = lax.ppermute(west_edge, "xi", bwd)
            f = lax.dynamic_update_slice_in_dim(
                f, from_west, 0, axis=f.ndim - 1)
            f = lax.dynamic_update_slice_in_dim(
                f, from_east, f.shape[-1] - nghost, axis=f.ndim - 1)
        # --- phase 2: south/north along 'eta' (ghost cols included:
        # corners resolved implicitly, mp_exchange.F:761-773) ---------
        if neta > 1 or periodic[0]:
            fwd, bwd = _ring_perm(neta)
            north_edge = lax.slice_in_dim(f, f.shape[-2] - 2 * nghost,
                                          f.shape[-2] - nghost, axis=-2)
            south_edge = lax.slice_in_dim(f, nghost, 2 * nghost,
                                          axis=-2)
            from_south = lax.ppermute(north_edge, "eta", fwd)
            from_north = lax.ppermute(south_edge, "eta", bwd)
            f = lax.dynamic_update_slice_in_dim(
                f, from_south, 0, axis=f.ndim - 2)
            f = lax.dynamic_update_slice_in_dim(
                f, from_north, f.shape[-2] - nghost, axis=f.ndim - 2)
        return f

    return jax.tree_util.tree_map(one, fields)


def make_halo_exchange(mesh: Mesh, ndim: int = 2, nghost: int = 1):
    """Build the jitted mp_exchange analog over haloed shard blocks.

    The returned fn takes a global array laid out as per-shard blocks
    that INCLUDE their nghost-wide halo rings (shape
    (..., neta*bj, nxi*bi) with each (bj, bi) block = ring + interior)
    and refreshes every ring from the neighbor interiors via
    lax.ppermute — the explicit halo path for manual shard_map
    kernels, riding ICI."""
    spec = P(*([None] * (ndim - 2) + ["eta", "xi"]))

    @partial(shard_map, mesh=mesh, in_specs=spec, out_specs=spec)
    def exchange(block):
        return halo_refresh(block, mesh, nghost=nghost)

    return jax.jit(exchange)


def blocks_with_halo(global_field, mesh: Mesh, nghost: int = 1):
    """Host-side: split a trailing-(eta, xi) global field into per-shard
    blocks carrying (stale) halo rings, concatenated back into one
    array laid out for make_halo_exchange.  Periodic wrap assumed."""
    import numpy as np
    neta = mesh.shape["eta"]
    nxi = mesh.shape["xi"]
    f = np.asarray(global_field)
    Mj, Li = f.shape[-2:]
    bj, bi = Mj // neta, Li // nxi
    rows = []
    for jb in range(neta):
        cols = []
        for ib in range(nxi):
            js = np.arange(jb * bj - nghost, (jb + 1) * bj + nghost) % Mj
            isl = np.arange(ib * bi - nghost,
                            (ib + 1) * bi + nghost) % Li
            cols.append(f[..., js[:, None], isl[None, :]])
        rows.append(np.concatenate(cols, axis=-1))
    return np.concatenate(rows, axis=-2)
