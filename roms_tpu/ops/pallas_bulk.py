"""Fused COARE bulk-flux Pallas kernel.

bulk_flux is ~200 purely elementwise 2-D operations (three unrolled
Monin-Obukhov iterations of transcendental-heavy similarity math);
under XLA they fragment into dozens of small kernels whose launch
latency dominates (~3 ms at BENCHMARK2).  This wrapper runs the
existing core (core.bulk_flux.bulk_flux_rho) inside ONE pallas_call
over (8, 512) blocks — same math, one kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.bulk_flux import AtmState, bulk_flux_rho
from ..ops import stencil as st


def _kernel(cfg, cool_skin, coare35,
            uw_ref, vw_ref, ta_ref, pa_ref, ha_ref, cl_ref, rn_ref,
            sr_ref, sst_ref, sss_ref, rs_ref,
            taux_ref, tauy_ref, stT_ref, stS_ref):
    atm = AtmState(Uwind=uw_ref[...], Vwind=vw_ref[...],
                   Tair=ta_ref[...], Pair=pa_ref[...],
                   Hair=ha_ref[...], cloud=cl_ref[...],
                   rain=rn_ref[...], srflx=sr_ref[...])
    Taux, Tauy, stT, stS, *_ = bulk_flux_rho(
        cfg, atm, sst_ref[...], sss_ref[...], rs_ref[...],
        cool_skin=cool_skin, coare35=coare35)
    taux_ref[...] = Taux
    tauy_ref[...] = Tauy
    stT_ref[...] = stT
    stS_ref[...] = stS


def bulk_flux_pallas(cfg, atm: AtmState, sst, sss, rho_surf,
                     cool_skin: bool = False, coare35: bool = False,
                     interpret: bool = False):
    """Returns (sustr, svstr, stflx_T, stflx_S); staggering applied
    outside the kernel (the only non-elementwise step)."""
    Mj, Li = sst.shape
    dtype = sst.dtype
    BJ = 8
    BI = min(512, max(128, ((Li + 127) // 128) * 128))
    grid = (pl.cdiv(Mj, BJ), pl.cdiv(Li, BI))
    spec = pl.BlockSpec((BJ, BI), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    inputs = [jnp.broadcast_to(x, (Mj, Li)).astype(dtype)
              for x in (atm.Uwind, atm.Vwind, atm.Tair, atm.Pair,
                        atm.Hair, atm.cloud, atm.rain, atm.srflx,
                        sst, sss, rho_surf)]
    outs = pl.pallas_call(
        functools.partial(_kernel, cfg, cool_skin, coare35),
        out_shape=tuple(jax.ShapeDtypeStruct((Mj, Li), dtype)
                        for _ in range(4)),
        grid=grid,
        in_specs=[spec] * 11,
        out_specs=(spec,) * 4,
        interpret=interpret,
    )(*inputs)
    Taux, Tauy, stT, stS = outs
    sustr = 0.5 * (Taux + st.im1(Taux)) / cfg.rho0
    svstr = 0.5 * (Tauy + st.jm1(Tauy)) / cfg.rho0
    return sustr, svstr, stT, stS
