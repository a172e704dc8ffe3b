"""Suspended-sediment transport with bed exchange.

Round-1 scope of the reference sediment module
(ROMS/Nonlinear/Sediment/): suspended classes advected/diffused as
tracers by the 3D engine, plus the column processes implemented here —

  - settling (sed_settling.F; CFL-limited upwind in place of the
    reference's PPM reconstruction, upgrade scheduled),
  - deposition through the bottom interface into the bed,
  - resuspension (sed_fluxes.F:255-283):
        ero_flux = min( max(0, dt*Erate*(1-poro)*frac*(tau_w/tau_ce-1)),
                        bed_mass + settling_flux )
    with tau_w = |bottom stress| (rho0-kinematic),
  - single bed layer mass bookkeeping (sed_bed.F reduced to one layer).

Bedload (sed_bedload.F) and multi-layer stratigraphy follow in a later
round.  Sediment tracers occupy slots [NAT+offset, ...) of the tracer
stack.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st


@dataclass(frozen=True)
class SedConfig:
    """Per-class parameters (sediment.in defaults for sand)."""
    nsed: int = 1
    offset: int = 0            # tracer index of first sed class - NAT
    Wsed: Tuple[float, ...] = (1.0,)       # settling velocity (mm/s)
    Erate: Tuple[float, ...] = (5.0e-5,)   # surface erosion (kg/m2/s)
    tau_ce: Tuple[float, ...] = (0.05,)    # critical erosion (N/m2)
    Srho: Tuple[float, ...] = (2650.0,)    # grain density (kg/m3)
    poros: float = 0.5


class SedState(NamedTuple):
    bed_mass: jnp.ndarray       # (nsed, Mj, Li) kg/m2


def initial_sed(cfg: ModelConfig, sed: SedConfig,
                bed_mass0: float = 1.0) -> SedState:
    shp = (sed.nsed,) + cfg.shape2d
    return SedState(bed_mass=jnp.full(shp, bed_mass0, cfg.dtype))


def sed_column(cfg: ModelConfig, sed: SedConfig, grid: Grid, t,
               sstate: SedState, Hz, bustr, bvstr):
    """Settling + bed exchange for all classes.

    t: tracer stack with sediment concentrations (kg/m3) in their slots.
    Returns (tracer increment stack, new SedState).
    """
    dt = cfg.dt
    nb = cfg.NAT + sed.offset
    rho0 = cfg.rho0

    # bottom stress magnitude at rho points (sed_fluxes.F:219-224), in
    # N/m2 (bustr is kinematic m2/s2)
    taux = 0.5 * (bustr + st.ip1(bustr))
    tauy = 0.5 * (bvstr + st.jp1(bvstr))
    tau_w = rho0 * jnp.sqrt(taux ** 2 + tauy ** 2)

    inc = jnp.zeros_like(t)
    new_bed = []
    for s in range(sed.nsed):
        c = jnp.maximum(t[nb + s], 0.0)
        w = sed.Wsed[s] * 1.0e-3 * dt          # m per step

        # settling: downward upwind flux through interfaces (kg/m2/step)
        dzlim = jnp.minimum(w, 0.9 * Hz)
        flux_int = dzlim[1:] * c[1:]           # through interior faces
        flux_bot = dzlim[0] * c[0]             # deposition to the bed
        zpad = jnp.zeros_like(c[:1])
        dflux = jnp.concatenate([flux_int, zpad], axis=0) - \
            jnp.concatenate([flux_bot[None], flux_int], axis=0)
        dc = dflux / Hz

        # resuspension from the bed (sed_fluxes.F:263-281)
        cff1 = (1.0 - sed.poros)
        ero = dt * sed.Erate[s] * cff1 * \
            jnp.maximum(0.0, tau_w / sed.tau_ce[s] - 1.0)
        ero = jnp.minimum(ero, sstate.bed_mass[s] + flux_bot)
        dc = dc.at[0].add(ero / Hz[0])

        inc = inc.at[nb + s].set(dc)
        new_bed.append(sstate.bed_mass[s] + flux_bot - ero)

    return inc, SedState(bed_mass=jnp.stack(new_bed))


def make_sed_hook(cfg: ModelConfig, sed: SedConfig, grid: Grid):
    def hook(t, sstate, Hz, bustr, bvstr):
        return sed_column(cfg, sed, grid, t, sstate, Hz, bustr, bvstr)
    return hook
