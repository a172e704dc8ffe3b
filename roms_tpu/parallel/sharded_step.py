"""Whole-step explicit-halo engine: the FULL baroclinic step inside one
shard_map region (VERDICT round-3 item 2 — the production multi-chip
path; generalized round 5 to reuse Model.step_impl verbatim).

Collective budget per step (vs ~900 collective-permutes for the GSPMD
whole-array path at BENCHMARK1):

  R1  start-of-step refresh: ONE stacked 3-D slab (u, v, all tracers,
      previous tracers, + tke/gls history for GLS runs) + ONE 2-D slab
      (zeta, ubar, vbar)             -> 8 permutes (2 axes x 2 dirs)
  fast loop: refresh every `refresh_every` substeps, 4 fields stacked
      (mp_exchange.F:290-333 aggregation)
                                       -> 4 * ceil(nfast/k) permutes
  R2  after the fast loop: the 5 fast-average fields, one slab
                                       -> 4 permutes

The 3-D phases run WITHOUT mid-phase exchanges: the nghost-wide halo
ring absorbs the whole prep+predictor+corrector stencil chain (the
widened-halo discipline; reach pinned by tests/test_sharded_step.py
point-perturbation test), and parallel.blockctx applies every wall
boundary condition at the true domain edges per block.  Interior
equality vs the unsharded Model.step is asserted to f64 roundoff in
tests/test_sharded_step.py.

Instead of duplicating the step, the engine calls the Model's OWN
``step_impl`` inside the shard_map region with three substitutions
(core/stepping.py hook parameters):

  * ``forcing_fn`` — rebuilt from ``forcing_factory(cfg, grid_block)``
    so bulk fluxes are computed block-locally INSIDE the region (no
    global gather; the reference computes bulk_flux.F per tile);
  * ``fast_loop`` — the halo-refreshing barotropic sub-cycle below;
  * blocked-grid argument — every stencil/boundary primitive consults
    parallel.blockctx and lands wall writes on true domain edges.

Supported class (round 5): EW-periodic OR walled xi (closed/
gradient/clamped W/E, blockctx gcol masks), N/S walls, LMD-KPP /
GLS / MY2.5 / constant / analytic vmix, all prsgrd schemes,
column-local ecosystem (bio_fn) and sediment (sed_fn) hooks,
wet/dry, open boundaries (radiation/Chapman/Flather/clamped via
blocked gcol/grow masks), climatology nudging (clm_fn data blocked
per step), LuvSrc/LwSrc point sources (blocked once — static
fields), equilibrium tide + inverse-barometer pressure (eqt/pair
aux blocked per step), the MB/SSW/SG wave-current BBL via a
``bbl_factory(cfg, grid_block)`` rebuilt in-region (BBLState rides
the state pytree), and WEC vortex-force/Stokes-coupling via a
``wec_factory(cfg, grid_block)`` (stokes2d enters the blocked fast
loop like the unsharded one), and sea ice via an
``ice_factory(cfg, grid_block, refresh)`` whose EVP subcycle
refreshes its 5-field carry per group of elastic substeps
(seaice.make_ice_fn(refresh=...); ice_evp.F per-substep exchange
aggregated like the fast loop).  Still unsupported: Shchepetkin/
reduced OBCs, VolCons, nesting, coupled wave imports — these raise
at construction.
Horizontal advection schemes are guarded against the nghost budget
(`_check_stencil_reach`); wide-stencil schemes (MPDATA/HSIMT/AKIMA4)
raise instead of silently corrupting interiors.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import CENTERED2, CENTERED4, UPSTREAM3
from ..core.state import State
from ..core.step2d import FastAverages, make_substep_kernels
from ..core.weights import power_law_weights
from ..grid.depth import set_depth
from ..ops.kernel_gate import no_pallas
from . import blockctx as bctx
from .blocked import (from_blocks, gcol_array, grow_array,
                      make_layout, refresh_block, to_blocks)

# Horizontal advection schemes whose full-step contamination reach is
# covered by the validated nghost=14 / refresh_every=2 budget (reach
# pinned <= 11 cells by the point-perturbation test).  MPDATA/HSIMT/
# AKIMA4 have wider or iteration-dependent stencils and are refused.
_SUPPORTED_HADV = {UPSTREAM3, CENTERED4, CENTERED2}
_SUPPORTED_UV_HADV = {"up3", "c2", "c4"}


def _check_stencil_reach(cfg, nghost: int) -> None:
    """Refuse configurations whose advection stencils exceed the halo
    budget (the reference never needs this — it exchanges after every
    kernel; the widened-halo engine exchanges once per step)."""
    schemes = {cfg.hadv} | set(cfg.hadv_t or ())
    bad = sorted(s for s in schemes if s not in _SUPPORTED_HADV)
    if bad:
        raise ValueError(
            f"sharded step: tracer advection {bad} exceeds the "
            f"nghost={nghost} halo budget (supported: "
            f"{sorted(_SUPPORTED_HADV)})")
    if cfg.uv_hadv not in _SUPPORTED_UV_HADV:
        raise ValueError(
            f"sharded step: momentum advection {cfg.uv_hadv!r} not "
            f"validated for the halo budget")
    if nghost < 12:
        raise ValueError(
            f"sharded step: nghost={nghost} below the validated "
            "full-step reach budget (>= 12)")


class ShardedStep:
    """Explicit-halo sharded stepper around a core Model.

    step(state) takes and returns GLOBAL state (blocking on device at
    the jit boundary); step_blocked operates on permanently blocked
    state (the production loop — no per-step block/unblock); step_fn
    is the underlying jitted function for HLO audits
    (dryrun_multichip collective accounting).

    forcing_factory(cfg, grid) rebuilds the model's forcing function
    from a BLOCK grid so surface fluxes are computed inside the
    shard_map region (pass the same factory the app used, e.g.
    functionals.benchmark.make_bulk_forcing_fn).
    """

    def __init__(self, model, mesh: Mesh, nghost: int = 14,
                 refresh_every: int = 2,
                 forcing_factory: Optional[Callable] = None,
                 bbl_factory: Optional[Callable] = None,
                 wec_factory: Optional[Callable] = None,
                 ice_factory: Optional[Callable] = None):
        cfg = model.cfg
        if cfg.bc.ns_periodic:
            raise ValueError("sharded step: NS-periodic unsupported "
                             "(decompose the periodic axis as xi)")
        if model.ice_fn is not None and ice_factory is None:
            raise ValueError(
                "sharded step: a model with ice_fn needs an "
                "ice_factory(cfg, grid_block, refresh) so the EVP "
                "subcycle refreshes halos per group of elastic "
                "substeps (ice_evp.F's per-substep mp_exchange; pass "
                "e.g. lambda c, g, r: seaice.make_ice_fn(c, icfg, g, "
                "atm_fn, refresh=r))")
        if model.bbl_fn is not None and bbl_factory is None:
            raise ValueError(
                "sharded step: a model with bbl_fn needs a "
                "bbl_factory(cfg, grid_block) so the wave-current "
                "closure is rebuilt block-locally (it closes over "
                "grid.h/angler; the reference computes bblm per tile)")
        if model.wec_fn is not None and wec_factory is None:
            raise ValueError(
                "sharded step: a model with wec_fn needs a "
                "wec_factory(cfg, grid_block) (stokes drift / vortex "
                "force close over the grid; wec_vf is per-tile in the "
                "reference)")
        from ..config import REDUCED, SHCHEPETKIN
        if cfg.bc.volcons:
            # core.obc._obc_volcons_blocked implements the psum-based
            # integrals and edge rewrites (verified exact for a single
            # step), but the post-correction ghost-column convention at
            # open edges still differs between the global and blocked
            # paths across steps — keep refusing until that is unified
            raise ValueError(
                "sharded step: VolCons unsupported (blocked integrals "
                "exist but multi-step open-edge ghost discipline "
                "differs; see core.obc._obc_volcons_blocked)")
        for lbc in (cfg.bc.zeta, cfg.bc.ubar, cfg.bc.vbar, cfg.bc.u,
                    cfg.bc.v, cfg.bc.t):
            for side in ("west", "east", "south", "north"):
                if getattr(lbc, side) in (SHCHEPETKIN, REDUCED):
                    raise ValueError(
                        "sharded step: Shchepetkin/reduced open "
                        "boundaries not blocked yet")
        if cfg.omega_implicit:
            raise ValueError("sharded step: OMEGA_IMPLICIT unsupported")
        _check_stencil_reach(cfg, nghost)
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.lay = make_layout(cfg, mesh, nghost)
        self.refresh_every = refresh_every
        self.forcing_factory = forcing_factory
        self.bbl_factory = bbl_factory
        self.wec_factory = wec_factory
        self.ice_factory = ice_factory
        self._use_gls = cfg.mixing.vmix in ("gls", "my25")
        self.nfast, w1, w2 = power_law_weights(cfg.ndtfast)
        dtype = jnp.dtype(cfg.dtype)
        self._w1 = jnp.asarray(w1, dtype)
        self._w2 = jnp.asarray(w2, dtype)
        self._kern = make_substep_kernels(cfg, self.nfast, self._w1,
                                          self._w2, True)
        lay = self.lay

        def _blk(x):
            a = jnp.asarray(x)
            if a.ndim >= 2 and a.shape[-2:] == cfg.shape2d:
                return to_blocks(a, lay)
            return a

        self.gridblk = jax.tree_util.tree_map(_blk, model.grid)
        self.grow = grow_array(lay)
        self.gcol = gcol_array(lay)
        self._blk = _blk

        def _spec(x):
            if hasattr(x, "ndim") and x.ndim >= 2 and \
                    x.shape[-2:] == (lay.neta * lay.BJ,
                                     lay.nxi * lay.BI):
                return P(*([None] * (x.ndim - 2) + ["eta", "xi"]))
            # blocked boundary LINES (obc data): sharded on their
            # tangent axis
            if hasattr(x, "ndim") and x.ndim >= 1 and \
                    x.shape[-1] == lay.nxi * lay.BI:
                return P(*([None] * (x.ndim - 1) + ["xi"]))
            if hasattr(x, "ndim") and x.ndim >= 1 and \
                    x.shape[-1] == lay.neta * lay.BJ:
                return P(*([None] * (x.ndim - 1) + ["eta"]))
            return P(*([None] * getattr(x, "ndim", 0)))

        self._spec = _spec
        self._grid_specs = jax.tree_util.tree_map(_spec, self.gridblk)
        self._step_sm = None

        # to/from-block converters at the jit boundary
        def block_state(s: State) -> State:
            return jax.tree_util.tree_map(self._blk, s)

        def unblock_state(s: State) -> State:
            return jax.tree_util.tree_map(
                lambda a: (from_blocks(a, lay)
                           if hasattr(a, "ndim") and a.ndim >= 2
                           and a.shape[-2:] == (lay.neta * lay.BJ,
                                                lay.nxi * lay.BI)
                           else a), s)

        self.block_state = jax.jit(block_state)
        self.unblock_state = jax.jit(unblock_state)

    # -----------------------------------------------------------------
    def _refresh3(self, fields):
        """One stacked refresh of a list of (N-or-so, BJ, BI) slabs."""
        stack = jnp.concatenate([f.reshape((-1,) + f.shape[-2:])
                                 for f in fields], axis=0)
        stack = refresh_block(stack, self.lay)
        out = []
        pos = 0
        for f in fields:
            n = int(np.prod(f.shape[:-2])) if f.ndim > 2 else 1
            out.append(stack[pos:pos + n].reshape(f.shape))
            pos += n
        return out

    # -----------------------------------------------------------------
    def _step_impl_blocked(self, grid, grow, gcol, state: State,
                           forcing, aux=None):
        """The per-device step body: R1 halo refresh, then the Model's
        own step_impl with block-local forcing and the halo-refreshing
        fast loop (main3d.F cycle with the mp_exchange discipline
        collapsed into the three aggregated refresh points)."""
        cfg = self.cfg
        ctx = bctx.BlockCtx(grow=grow, Mm=cfg.Mm, gcol=gcol,
                            Lm=cfg.Lm,
                            xi_periodic=self.lay.xi_periodic,
                            nghost=self.lay.nghost)
        with bctx.block_ctx(ctx), no_pallas():
            # ---- R1: start-of-step halo refresh --------------------
            f3 = [state.u, state.v, state.t, state.t_prev]
            if self._use_gls:
                mx = state.mix
                f3 += [mx.tke, mx.tke_prev, mx.gls, mx.gls_prev]
            out3 = self._refresh3(f3)
            u, v, t, t_prev = out3[:4]
            mix = state.mix
            if self._use_gls:
                mix = mix._replace(tke=out3[4], tke_prev=out3[5],
                                   gls=out3[6], gls_prev=out3[7])
            zeta, ubar, vbar = self._refresh3(
                [state.zeta, state.ubar, state.vbar])
            # depths recomputed locally from the refreshed free
            # surface (pure local function; bit-identical to global)
            z_r, z_w, Hz = set_depth(grid, zeta)
            state = state._replace(u=u, v=v, t=t, t_prev=t_prev,
                                   zeta=zeta, ubar=ubar, vbar=vbar,
                                   z_r=z_r, z_w=z_w, Hz=Hz, mix=mix)

            if self.forcing_factory is not None:
                # block-local forcing: rebuilt from the BLOCK grid at
                # trace time; runs entirely inside the region
                forcing_fn = self.forcing_factory(cfg, grid)
            else:
                forcing_fn = lambda *a: forcing  # noqa: E731

            aux = aux or {}
            bbl_fn = (self.bbl_factory(cfg, grid)
                      if self.bbl_factory is not None else None)
            wec_fn = (self.wec_factory(cfg, grid)
                      if self.wec_factory is not None else None)
            ice_fn = (self.ice_factory(cfg, grid, self._refresh3)
                      if self.ice_factory is not None else None)
            return self.model.step_impl(
                state, grid=grid, forcing_fn=forcing_fn,
                fast_loop=self._fast_loop_blocked,
                obc_data=aux.get("obc"), clm_data=aux.get("clm"),
                sources_data=aux.get("sources"),
                eqt_data=aux.get("eqt"), pair_data=aux.get("pair"),
                bbl_fn=bbl_fn, wec_fn=wec_fn, ice_fn=ice_fn)

    def _fast_loop_blocked(self, grid, zeta0, ubar0, vbar0, rufrc,
                           rvfrc, rhoS, rhoA, ru0_prev, rv0_prev,
                           ru0_prev2, rv0_prev2, iic, obc=None,
                           sources=None, stokes2d=None):
        """Drop-in for core.step2d.make_fast_loop's loop with the
        reference's fast-cycle exchange discipline: one stacked
        4-field refresh every `refresh_every` substeps
        (mp_exchange.F:290-333 aggregation), plus the R2 refresh of
        the fast-average outputs."""
        predictor, corrector, aux_pass, init_carry = self._kern
        lay = self.lay
        nfast = self.nfast

        def refresh(c):
            stack = jnp.stack((c.zeta, c.zeta_prev, c.ubar, c.vbar))
            stack = refresh_block(stack, lay)
            return c._replace(zeta=stack[0], zeta_prev=stack[1],
                              ubar=stack[2], vbar=stack[3])

        carry = init_carry(zeta0, ubar0, vbar0, rufrc, rvfrc,
                           ru0_prev, rv0_prev)

        def substep(c, iif):
            (zeta_p, ubar_p, vbar_p, rz_m, ru_m, rv_m, rufrc_c,
             rvfrc_c, avg) = predictor(grid, iif, c, rhoS, rhoA, iic,
                                       ru0_prev2, rv0_prev2, obc,
                                       sources, stokes2d)
            c = c._replace(avg=avg)
            return corrector(grid, iif, c, zeta_p, ubar_p, vbar_p,
                             rz_m, ru_m, rv_m, rufrc_c, rvfrc_c,
                             rhoS, rhoA, obc, sources, stokes2d)

        k = self.refresh_every
        ngroup = nfast // k

        def body(c, grp):
            c = refresh(c)
            for q in range(k):
                c = substep(c, grp * k + 1 + q)
            return c, None

        carry, _ = lax.scan(body, carry,
                            jnp.arange(ngroup, dtype=jnp.int32))
        for q in range(nfast - ngroup * k):
            if q == 0:
                carry = refresh(carry)
            carry = substep(carry, jnp.int32(ngroup * k + 1 + q))
        carry = refresh(carry)
        (avg, rufrc_eff, rvfrc_eff, zf, uf, vf) = aux_pass(
            grid, carry, sources, stokes2d)

        # ---- R2: refresh the fast averages -------------------------
        (Zt_avg1, DU_avg1, DV_avg1, DU_avg2, DV_avg2) = self._refresh3(
            [avg.Zt_avg1, avg.DU_avg1, avg.DV_avg1, avg.DU_avg2,
             avg.DV_avg2])
        avg = FastAverages(Zt_avg1, DU_avg1, DV_avg1, DU_avg2,
                           DV_avg2)
        return avg, rufrc_eff, rvfrc_eff, zf, uf, vf

    # -----------------------------------------------------------------
    def _build(self, state_blk, forcing_blk, aux_blk=None):
        tm = jax.tree_util.tree_map
        state_spec = tm(self._spec, state_blk)
        fspec = tm(self._spec, forcing_blk)
        ospec = tm(self._spec, aux_blk) if aux_blk is not None \
            else None
        sm = shard_map(
            lambda g, gr, gc, s, f, o: self._step_impl_blocked(
                g, gr, gc, s, f, o),
            mesh=self.mesh,
            in_specs=(self._grid_specs, P("eta"), P("xi"),
                      state_spec, fspec, ospec),
            out_specs=state_spec)
        return jax.jit(sm)

    def _global_forcing(self, state_blk: State):
        """Fallback when no forcing_factory is given: compute the
        forcing on GLOBAL arrays (the model's own closure grid) and
        block it.  For state-taking (bulk) forcing this gathers the
        surface fields — pass a forcing_factory to avoid it."""
        m = self.model
        if not m._forcing_takes_state:
            return m.forcing_fn(state_blk.time)
        from ..core.rho_eos import rho_eos
        lay = self.lay
        sst = from_blocks(state_blk.t[0][-1], lay)
        sss = from_blocks(state_blk.t[1][-1], lay) \
            if self.cfg.NT > 1 else jnp.zeros_like(sst)
        rho_s = rho_eos(self.cfg,
                        jax.tree_util.tree_map(
                            lambda a: from_blocks(a, lay), state_blk.t),
                        from_blocks(state_blk.z_r, lay),
                        from_blocks(state_blk.Hz, lay),
                        from_blocks(state_blk.z_w, lay))[0]
        return m.forcing_fn(state_blk.time, sst, sss, rho_s[-1])

    def _block_obc(self, obc):
        """Block an obc data pytree: boundary lines gather onto the
        blocked tangent coordinate (with halos) so every device slices
        its own piece under the P('eta'/'xi') line specs."""
        from .blocked import to_blocks_line_eta, to_blocks_line_xi
        lay = self.lay

        def walk(node):
            if isinstance(node, dict):
                out = {}
                for k, v in node.items():
                    if k in ("west", "east"):
                        out[k] = to_blocks_line_eta(v, lay)
                    elif k in ("south", "north"):
                        out[k] = to_blocks_line_xi(v, lay)
                    else:
                        out[k] = walk(v)
                return out
            return node
        return walk(obc)

    def step_blocked(self, state_blk: State) -> State:
        """One step on BLOCKED state (the production loop shape)."""
        if self.forcing_factory is not None:
            # forcing computed inside the region; pass a zero-size
            # placeholder pytree
            forcing_blk = ()
        else:
            forcing_blk = jax.tree_util.tree_map(
                self._blk, self._global_forcing(state_blk))
        aux_blk = None
        if self._has_aux_hooks():
            aux_blk = {}
            if self.model.obc_fn is not None:
                aux_blk["obc"] = self._block_obc(
                    self.model.obc_fn(state_blk.time))
            if self.model.clm_fn is not None:
                aux_blk["clm"] = jax.tree_util.tree_map(
                    self._blk, self.model.clm_fn(state_blk.time))
            if self.model.sources is not None:
                # LuvSrc/LwSrc river fields are time-independent:
                # blocked once, sharded like any field pytree
                aux_blk["sources"] = jax.tree_util.tree_map(
                    self._blk, self.model.sources)
            if self.model.eq_tide_fn is not None:
                # equilibrium-tide surface (set_tides.F POT_TIDES):
                # a 2-D rho field; to_blocks fills its halo ring from
                # the global array so the prsgrd stencil sees correct
                # neighbor values without a refresh
                aux_blk["eqt"] = self._blk(
                    self.model.eq_tide_fn(state_blk.time))
            if self.model.pair_fn is not None:
                # inverse-barometer surface pressure (ATM_PRESS)
                aux_blk["pair"] = self._blk(
                    self.model.pair_fn(state_blk.time))
        if self._step_sm is None:
            self._step_sm = self._build(state_blk, forcing_blk,
                                        aux_blk)
        return self._step_sm(self.gridblk, self.grow, self.gcol,
                             state_blk, forcing_blk, aux_blk)

    def step(self, state: State) -> State:
        return self.unblock_state(
            self.step_blocked(self.block_state(state)))

    def _has_aux_hooks(self) -> bool:
        m = self.model
        return (m.obc_fn is not None or m.clm_fn is not None
                or m.sources is not None or m.eq_tide_fn is not None
                or m.pair_fn is not None)

    def run_blocked(self, state_blk: State, nsteps: int) -> State:
        """Advance nsteps with NO per-step block/unblock round trips
        (one jitted lax.scan when the forcing lives in-region)."""
        if self._has_aux_hooks():
            # boundary/climatology data comes from host-side hooks
            # per step (sources are static but ride the same path)
            for _ in range(nsteps):
                state_blk = self.step_blocked(state_blk)
            return state_blk
        if self.forcing_factory is None:
            for _ in range(nsteps):
                state_blk = self.step_blocked(state_blk)
            return state_blk
        if getattr(self, "_scan_fn", None) is None:
            if self._step_sm is None:
                self._step_sm = self._build(state_blk, (), None)

            def advance(s, n):
                def body(c, _):
                    return self._step_sm(self.gridblk, self.grow,
                                         self.gcol, c, (),
                                         None), None
                s, _ = lax.scan(body, s, None, length=n)
                return s
            self._scan_fn = jax.jit(advance, static_argnums=1)
        return self._scan_fn(state_blk, nsteps)
