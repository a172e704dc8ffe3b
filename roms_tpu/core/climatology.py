"""Climatology nudging and sponge layers.

Re-implements:
  - tracer nudging (step3d_t.F:1860-1880): after the implicit solve,
      t(nnew) += dt * Tnudgcof * (tclm - t(nnew))
  - 3D momentum climatology nudging (rhs3d.F:662-698): added to ru/rv
      with Hz weighting;
  - sponge layers (ana_sponge / ini_hmixcoef.F): edge-amplified
      visc2/diff2 profiles baked into the grid mixing-coefficient
      fields.

Climatology data enters via a Model clm_fn(time) returning a dict with
optional keys: 'tclm' (NT,N,Mj,Li), 'Tnudgcof' (Mj,Li) or (N,Mj,Li)
[1/s], 'uclm'/'vclm' (N,Mj,Li), 'M3nudgcof' (Mj,Li).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st


def nudge_tracers(cfg: ModelConfig, clm, t_new):
    """Post-solve tracer nudging (step3d_t.F J_LOOP2 tail)."""
    if not clm or "tclm" not in clm:
        return t_new
    coef = clm.get("Tnudgcof", 0.0)
    return t_new + cfg.dt * coef * (clm["tclm"] - t_new)


def nudge_momentum_rhs(cfg: ModelConfig, grid: Grid, clm, u, v, Hz,
                       ru, rv):
    """Momentum climatology term in the 3D RHS (rhs3d.F:662-698)."""
    if not clm or "uclm" not in clm:
        return ru, rv
    coef = clm.get("M3nudgcof", 0.0)
    cf_u = 0.5 * (coef + st.im1(coef)) if hasattr(coef, "ndim") else coef
    cf_v = 0.5 * (coef + st.jm1(coef)) if hasattr(coef, "ndim") else coef
    Hz_u = 0.5 * (Hz + st.im1(Hz))
    Hz_v = 0.5 * (Hz + st.jm1(Hz))
    area_u = grid.om_u * grid.on_u
    area_v = grid.om_v * grid.on_v
    ru = ru + cf_u * area_u * Hz_u * (clm["uclm"] - u)
    rv = rv + cf_v * area_v * Hz_v * (clm["vclm"] - v)
    return ru, rv


def sponge_profile(cfg: ModelConfig, width: int, factor: float,
                   edges=("west", "east", "south", "north")):
    """Edge-amplification factor field (ana_sponge pattern): 1 in the
    interior, ramping linearly to `factor` at open edges over `width`
    cells.  Multiply grid.visc2_r/visc2_p/diff2 by this at setup."""
    Mj, Li = cfg.shape2d
    amp = np.ones((Mj, Li))
    ramp = np.linspace(factor, 1.0, width)
    if "west" in edges:
        amp[:, :width] = np.maximum(amp[:, :width], ramp[None, :])
    if "east" in edges:
        amp[:, -width:] = np.maximum(amp[:, -width:], ramp[None, ::-1])
    if "south" in edges:
        amp[:width, :] = np.maximum(amp[:width, :], ramp[:, None])
    if "north" in edges:
        amp[-width:, :] = np.maximum(amp[-width:, :], ramp[::-1, None])
    return jnp.asarray(amp, cfg.dtype)


def apply_sponge(grid: Grid, amp) -> Grid:
    """Return a new Grid with sponge-scaled mixing coefficients."""
    kw = {name: getattr(grid, name) for name in Grid.FIELDS}
    kw.update({name: getattr(grid, name) for name in Grid.AUX})
    kw["visc2_r"] = kw["visc2_r"] * amp
    kw["visc2_p"] = kw["visc2_p"] * amp
    kw["diff2"] = kw["diff2"] * amp[None]
    return Grid(**kw)
