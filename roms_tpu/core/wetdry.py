"""Wetting and drying masks (ROMS/Nonlinear/wetdry.F).

A cell is dry when its total depth falls below Dcrit; dry cells are
removed from the dynamics each fast step via multiplicative masks, and
U/V faces adjacent to exactly one dry cell carry a signed mask
(+-1, wetdry.F wetdry_mask_tile) that allows only draining flow —
applied through the sign-selector of step2d_LF_AM3.h:2471-2486:

    cff5 = ||m|-1|            (1 when both-wet(2)/both-dry(0), 0 when +-1)
    cff6 = 0.5 + sign(0.5, q)*m
    cff7 = 0.5*m*cff5 + cff6*(1-cff5)
    q    = q*cff7
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st

_EPS = 1.0e-10


class WetMasks(NamedTuple):
    rmask_wet: jnp.ndarray
    umask_wet: jnp.ndarray     # 0, +-1, or 2 (signed draining logic)
    vmask_wet: jnp.ndarray


def compute_wet_masks(cfg: ModelConfig, grid: Grid, zeta) -> WetMasks:
    wet = jnp.where(zeta + grid.h <= cfg.Dcrit + _EPS, 0.0, 1.0) \
        * grid.rmask
    usum = st.im1(wet) + wet
    umask_wet = jnp.where(usum == 1.0, st.im1(wet) - wet, usum)
    vsum = st.jm1(wet) + wet
    vmask_wet = jnp.where(vsum == 1.0, st.jm1(wet) - wet, vsum)
    return WetMasks(rmask_wet=wet, umask_wet=umask_wet,
                    vmask_wet=vmask_wet)


def mask_momentum(q, m):
    """Directional masking of a U/V-point quantity (velocity or RHS)."""
    both = jnp.abs(jnp.abs(m) - 1.0)       # cff5: 1 unless m == +-1
    sgn = 0.5 + jnp.sign(q) * 0.5 * m      # cff6 with sign(0.5,q)=0.5*sign
    gate = 0.5 * m * both + sgn * (1.0 - both)
    return q * gate


def clamp_dry_zeta(cfg: ModelConfig, grid: Grid, zeta):
    """Keep total depth >= Dcrit in dry cells (step2d 'Modify new
    free-surface to ensure depth > Dcrit' with MASKING semantics folded
    in: applied where the cell is dry)."""
    dry = (zeta + grid.h) <= cfg.Dcrit
    return jnp.where(dry, cfg.Dcrit - grid.h, zeta)
