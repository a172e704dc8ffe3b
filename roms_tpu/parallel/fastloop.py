"""Widened-halo sharded fast barotropic engine.

The GSPMD path partitions the whole-array fast loop automatically and
re-exchanges every stencil intermediate at every substep.  This module
runs the SAME LF-AM3 predictor/corrector kernels (core.step2d.
make_substep_kernels) per shard-block inside ONE shard_map region, with
an explicit aggregated halo refresh between substeps — the reference's
wide-halo discipline (mp_exchange.F:290-333 aggregates up to 4 arrays
per exchange; step2d_LF_AM3.h:707-714 exchanges twice per substep).

Design (TPU-first):
  - mesh (1, nxi) along the periodic xi axis; each shard block carries
    an `nghost`-wide halo ring on its xi edges.  Stencil rolls wrap
    block-locally, contaminating only the ring; physical NS boundary
    rows are whole inside every block, so the unmodified BC code is
    exact per block.
  - one refresh per `refresh_every` substeps exchanges the 4 evolving
    stencil-read carry fields (zeta, zeta_prev, ubar, vbar) STACKED
    into a single pair of lax.ppermute ops — 2 collective-permutes per
    refresh vs the ~dozens GSPMD schedules per substep.  Grid metrics,
    rhoS/rhoA and the pointwise-only carry fields keep exact or
    garbage-tolerant halos and are never exchanged.
  - the ring contamination grows by the substep stencil reach
    (~6 cells, measured in the round-2 Pallas fast-loop work); nghost
    must exceed reach*refresh_every.  Correctness vs the unsharded
    engine is asserted to 1e-12 in tests/test_fastloop_shard.py.

The periodic xi axis is decomposed WITHOUT the redundant global ghost
columns (stencil.periodic_x keeps field(0)=field(Lm) in the whole-array
layout): blocks tile the physical columns 1..Lm and halos wrap modulo
Lm, so block 0's west halo holds true east-interior data.  The global
ring is reconstructed on reassembly.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.step2d import FastAverages, make_substep_kernels
from ..ops import stencil as st


def _ring_perm(n):
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    return fwd, bwd


def block_x(x, nxi: int, nghost: int):
    """Host-side: strip the global xi ghost ring, tile the physical
    columns over nxi blocks and attach nghost-wide periodic halos.
    Returns one array with blocks concatenated along xi."""
    f = np.asarray(x)
    Lm = f.shape[-1] - 2
    if Lm % nxi:
        raise ValueError(f"Lm={Lm} not divisible by nxi={nxi}")
    bi = Lm // nxi
    interior = f[..., 1:-1]
    cols = []
    for ib in range(nxi):
        isl = np.arange(ib * bi - nghost, (ib + 1) * bi + nghost) % Lm
        cols.append(interior[..., isl])
    return np.concatenate(cols, axis=-1)


def unblock_x(x, nxi: int, nghost: int):
    """Host-side inverse: drop halos, reassemble the physical columns
    and restore the global periodic ghost ring."""
    f = np.asarray(x)
    bw = f.shape[-1] // nxi
    bi = bw - 2 * nghost
    cols = [f[..., ib * bw + nghost: ib * bw + nghost + bi]
            for ib in range(nxi)]
    interior = np.concatenate(cols, axis=-1)
    out = np.empty(f.shape[:-1] + (interior.shape[-1] + 2,), f.dtype)
    out[..., 1:-1] = interior
    out[..., 0] = interior[..., -1]     # field(0)   = field(Lm)
    out[..., -1] = interior[..., 0]     # field(Lm+1) = field(1)
    return out


def make_sharded_fast_loop(cfg, grid, mesh: Mesh, nfast: int, w1, w2,
                           var_rho: bool = True, nghost: int = 8,
                           refresh_every: int = 1):
    """Build the explicit-halo fast loop over `mesh` (shape (1, nxi)).

    Same call signature as core.step2d.make_fast_loop's return (the
    grid argument is ignored — blocks are captured), restricted to
    obc/sources/stokes2d == None.  Requires an EW-periodic, NS-walled
    domain (the BENCHMARK/UPWELLING channel family) so every block
    holds its full meridional extent and the unmodified BC code is
    exact per block.
    """
    if mesh.shape["eta"] != 1:
        raise ValueError("sharded fast loop shards xi only (mesh (1,n))")
    if not cfg.bc.ew_periodic or cfg.bc.ns_periodic:
        raise ValueError("requires EW-periodic / NS-walled domain")
    if getattr(cfg.bc, "volcons", False):
        raise ValueError("obc_volcons unsupported in the sharded loop")
    nxi = mesh.shape["xi"]
    dtype = jnp.dtype(cfg.dtype)
    w1j = jnp.asarray(w1, dtype)
    w2j = jnp.asarray(w2, dtype)
    predictor, corrector, aux_pass, init_carry = make_substep_kernels(
        cfg, nfast, w1j, w2j, var_rho)

    Mj, Li = cfg.shape2d

    def _blk(x):
        a = np.asarray(x)
        if a.ndim >= 2 and a.shape[-2:] == (Mj, Li):
            return jnp.asarray(block_x(a, nxi, nghost))
        return jnp.asarray(a)

    gridblk = jax.tree_util.tree_map(_blk, grid)
    blocked_L = nxi * ((Li - 2) // nxi + 2 * nghost)

    def _spec(x):
        if x.ndim >= 2 and x.shape[-1] == blocked_L:
            return P(*([None] * (x.ndim - 2) + ["eta", "xi"]))
        return P(*([None] * x.ndim))

    grid_specs = jax.tree_util.tree_map(_spec, gridblk)
    s2 = P("eta", "xi")
    fwd, bwd = _ring_perm(nxi)

    def refresh(c):
        """Aggregated ring exchange of the stencil-read carry fields:
        one ppermute pair for all four (mp_exchange.F 4-array path)."""
        stack = jnp.stack((c.zeta, c.zeta_prev, c.ubar, c.vbar))
        L = stack.shape[-1]
        east = lax.slice_in_dim(stack, L - 2 * nghost, L - nghost,
                                axis=-1)
        west = lax.slice_in_dim(stack, nghost, 2 * nghost, axis=-1)
        from_west = lax.ppermute(east, "xi", fwd)
        from_east = lax.ppermute(west, "xi", bwd)
        stack = lax.dynamic_update_slice_in_dim(
            stack, from_west, 0, axis=stack.ndim - 1)
        stack = lax.dynamic_update_slice_in_dim(
            stack, from_east, L - nghost, axis=stack.ndim - 1)
        return c._replace(zeta=stack[0], zeta_prev=stack[1],
                          ubar=stack[2], vbar=stack[3])

    @partial(shard_map, mesh=mesh,
             in_specs=(grid_specs,) + (s2,) * 11 + (P(),),
             out_specs=jax.tree_util.tree_map(
                 lambda _: s2,
                 (FastAverages(0, 0, 0, 0, 0), 0, 0, 0, 0, 0)))
    def run(g, zeta0, ubar0, vbar0, rufrc, rvfrc, rhoS, rhoA,
            ru0_prev, rv0_prev, ru0_prev2, rv0_prev2, iic):
        carry = init_carry(zeta0, ubar0, vbar0, rufrc, rvfrc,
                           ru0_prev, rv0_prev)

        def substep(c, iif):
            (zeta_p, ubar_p, vbar_p, rz_m, ru_m, rv_m, rufrc_c,
             rvfrc_c, avg) = predictor(g, iif, c, rhoS, rhoA, iic,
                                       ru0_prev2, rv0_prev2, None)
            c = c._replace(avg=avg)
            return corrector(g, iif, c, zeta_p, ubar_p, vbar_p,
                             rz_m, ru_m, rv_m, rufrc_c, rvfrc_c,
                             rhoS, rhoA, None)

        k = refresh_every
        ngroup = nfast // k

        def body(c, grp):
            c = refresh(c)
            for q in range(k):
                c = substep(c, grp * k + 1 + q)
            return c, None

        carry, _ = lax.scan(body, carry,
                            jnp.arange(ngroup, dtype=jnp.int32))
        for q in range(nfast - ngroup * k):    # odd tail
            if q == 0:
                carry = refresh(carry)
            carry = substep(carry,
                            jnp.int32(ngroup * k + 1 + q))
        carry = refresh(carry)                 # aux pass reads stencils
        return aux_pass(g, carry, None, None)

    run_jit = jax.jit(run)

    def fast_loop(grid_arg, zeta0, ubar0, vbar0, rufrc, rvfrc, rhoS,
                  rhoA, ru0_prev, rv0_prev, ru0_prev2, rv0_prev2, iic,
                  obc=None, sources=None, stokes2d=None):
        if obc not in (None, {}) or sources is not None \
                or stokes2d is not None:
            raise ValueError("sharded fast loop: obc/sources/stokes2d "
                             "must be None")
        fields = [zeta0, ubar0, vbar0, rufrc, rvfrc, rhoS, rhoA,
                  ru0_prev, rv0_prev, ru0_prev2, rv0_prev2]
        blocked = [jnp.asarray(block_x(f, nxi, nghost)) for f in fields]
        out = run_jit(gridblk, *blocked, jnp.asarray(iic))
        return jax.tree_util.tree_map(
            lambda a: jnp.asarray(unblock_x(a, nxi, nghost)), out)

    fast_loop.run_sharded = run_jit
    fast_loop.gridblk = gridblk
    fast_loop.block = lambda f: jnp.asarray(block_x(f, nxi, nghost))
    fast_loop.unblock = lambda a: jnp.asarray(unblock_x(a, nxi, nghost))
    return fast_loop


def make_sharded_fast_loop2d(cfg, grid, mesh: Mesh, nfast: int, w1, w2,
                             var_rho: bool = True, nghost: int = 8,
                             refresh_every: int = 1):
    """Generalized explicit-halo fast loop over a 2-D (eta, xi) mesh.

    Production variant of make_sharded_fast_loop (VERDICT round-3 item
    2): blocks are built ON DEVICE (parallel.blocked gathers, no host
    numpy), the eta axis decomposes the N/S-walled direction with the
    physical boundary rows maintained per-block through
    parallel.blockctx masked BCs, and halos refresh with the two-phase
    W/E-then-N/S ppermute discipline (mp_exchange.F:520-773).  Each
    refresh moves ONE stacked 4-field slab per direction —
    mp_exchange.F:290-333's aggregate-4-arrays optimization.

    Supported class: EW-periodic, N/S closed/gradient walls (the
    BENCHMARK/UPWELLING channel family); sources and stokes2d are
    supported (blocked local adds), obc data is not.
    """
    from . import blockctx as bctx
    from .blocked import (BlockLayout, grow_array, make_layout,
                          refresh_block, to_blocks)

    if not cfg.bc.ew_periodic or cfg.bc.ns_periodic:
        raise ValueError("requires EW-periodic / NS-walled domain")
    if getattr(cfg.bc, "volcons", ()):
        raise ValueError("obc_volcons unsupported in the sharded loop")
    lay = make_layout(cfg, mesh, nghost)
    dtype = jnp.dtype(cfg.dtype)
    w1j = jnp.asarray(w1, dtype)
    w2j = jnp.asarray(w2, dtype)
    predictor, corrector, aux_pass, init_carry = make_substep_kernels(
        cfg, nfast, w1j, w2j, var_rho)

    Mj, Li = cfg.shape2d

    def _blk(x):
        a = jnp.asarray(x)
        if a.ndim >= 2 and a.shape[-2:] == (Mj, Li):
            return to_blocks(a, lay)
        return a

    gridblk = jax.tree_util.tree_map(_blk, grid)
    grow = grow_array(lay)

    def _spec(x):
        if hasattr(x, "ndim") and x.ndim >= 2 \
                and x.shape[-2:] == (lay.neta * lay.BJ,
                                     lay.nxi * lay.BI):
            return P(*([None] * (x.ndim - 2) + ["eta", "xi"]))
        return P(*([None] * getattr(x, "ndim", 0)))

    grid_specs = jax.tree_util.tree_map(_spec, gridblk)
    s2 = P("eta", "xi")

    def refresh(c):
        """Aggregated two-phase exchange of the 4 stencil-read carry
        fields in one stacked slab (4 ppermutes on a 2-D mesh)."""
        stack = jnp.stack((c.zeta, c.zeta_prev, c.ubar, c.vbar))
        stack = refresh_block(stack, lay)
        return c._replace(zeta=stack[0], zeta_prev=stack[1],
                          ubar=stack[2], vbar=stack[3])

    def run(g, grow_blk, zeta0, ubar0, vbar0, rufrc, rvfrc, rhoS,
            rhoA, ru0_prev, rv0_prev, ru0_prev2, rv0_prev2, iic,
            sources, stokes2d):
        ctx = bctx.BlockCtx(grow=grow_blk, Mm=cfg.Mm)
        with bctx.block_ctx(ctx):
            carry = init_carry(zeta0, ubar0, vbar0, rufrc, rvfrc,
                               ru0_prev, rv0_prev)

            def substep(c, iif):
                (zeta_p, ubar_p, vbar_p, rz_m, ru_m, rv_m, rufrc_c,
                 rvfrc_c, avg) = predictor(g, iif, c, rhoS, rhoA, iic,
                                           ru0_prev2, rv0_prev2, None,
                                           sources, stokes2d)
                c = c._replace(avg=avg)
                return corrector(g, iif, c, zeta_p, ubar_p, vbar_p,
                                 rz_m, ru_m, rv_m, rufrc_c, rvfrc_c,
                                 rhoS, rhoA, None, sources, stokes2d)

            k = refresh_every
            ngroup = nfast // k

            def body(c, grp):
                c = refresh(c)
                for q in range(k):
                    c = substep(c, grp * k + 1 + q)
                return c, None

            carry, _ = lax.scan(body, carry,
                                jnp.arange(ngroup, dtype=jnp.int32))
            for q in range(nfast - ngroup * k):    # odd tail
                if q == 0:
                    carry = refresh(carry)
                carry = substep(carry,
                                jnp.int32(ngroup * k + 1 + q))
            carry = refresh(carry)                 # aux reads stencils
            return aux_pass(g, carry, sources, stokes2d)

    _run_cache = {}

    def _get_run(srcblk, stkblk):
        """shard_map specialization per sources/stokes pytree
        structure (their blocked leaves shard like the state)."""
        key = (jax.tree_util.tree_structure(srcblk),
               jax.tree_util.tree_structure(stkblk))
        if key not in _run_cache:
            def leafspec(x):
                return _spec(x) if hasattr(x, "ndim") else P()
            sspec = jax.tree_util.tree_map(leafspec, srcblk)
            kspec = jax.tree_util.tree_map(leafspec, stkblk)
            run_sm = shard_map(
                run, mesh=mesh,
                in_specs=(grid_specs, P("eta")) + (s2,) * 11
                + (P(), sspec, kspec),
                out_specs=jax.tree_util.tree_map(
                    lambda _: s2,
                    (FastAverages(0, 0, 0, 0, 0), 0, 0, 0, 0, 0)))
            _run_cache[key] = jax.jit(run_sm)
        return _run_cache[key]

    from .blocked import from_blocks
    _unblock_jit = jax.jit(lambda tree: jax.tree_util.tree_map(
        lambda a: from_blocks(a, lay), tree))

    def fast_loop(grid_arg, zeta0, ubar0, vbar0, rufrc, rvfrc, rhoS,
                  rhoA, ru0_prev, rv0_prev, ru0_prev2, rv0_prev2, iic,
                  obc=None, sources=None, stokes2d=None):
        if obc not in (None, {}):
            raise ValueError("sharded fast loop 2d: obc must be None")
        srcblk = jax.tree_util.tree_map(_blk, sources) \
            if sources is not None else None
        stkblk = jax.tree_util.tree_map(_blk, stokes2d) \
            if stokes2d is not None else None
        fields = [zeta0, ubar0, vbar0, rufrc, rvfrc, rhoS, rhoA,
                  ru0_prev, rv0_prev, ru0_prev2, rv0_prev2]
        blocked_in = [to_blocks(jnp.asarray(f), lay) for f in fields]
        out = _get_run(srcblk, stkblk)(
            gridblk, grow, *blocked_in, jnp.asarray(iic), srcblk,
            stkblk)
        return _unblock_jit(out)

    fast_loop.get_run = _get_run
    fast_loop.gridblk = gridblk
    fast_loop.layout = lay
    fast_loop.grow = grow
    return fast_loop
