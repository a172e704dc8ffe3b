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


def nudge_momentum2d_rhs(cfg: ModelConfig, grid: Grid, clm, zeta,
                         ubar, vbar, rufrc, rvfrc):
    """2D momentum climatology nudging (step2d_LF_AM3.h:2182-2201):

        rhs_ubar += 0.25*(M2cof_im1+M2cof)*om_u*on_u
                    * (D_im1+D) * (ubarclm - ubar)

    folded into the slow forcing rufrc/rvfrc that the fast loop adds
    every substep — equivalent for the day-scale rates involved, and
    keeps the nudging out of the barotropic hot loop."""
    if not clm or "ubarclm" not in clm:
        return rufrc, rvfrc
    coef = clm.get("M2nudgcof", 0.0)
    D = zeta + grid.h
    if hasattr(coef, "ndim") and coef.ndim == 2:
        cf_u = 0.25 * (coef + st.im1(coef))
        cf_v = 0.25 * (coef + st.jm1(coef))
    else:
        cf_u = cf_v = 0.5 * coef
    rufrc = rufrc + cf_u * grid.om_u * grid.on_u * (D + st.im1(D)) * \
        (clm["ubarclm"] - ubar)
    rvfrc = rvfrc + cf_v * grid.om_v * grid.on_v * (D + st.jm1(D)) * \
        (clm["vbarclm"] - vbar)
    return rufrc, rvfrc


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


def apply_sponge(grid: Grid, amp, uv: bool = True, ts: bool = True,
                 amp_ts=None) -> Grid:
    """Return a new Grid with sponge-scaled mixing coefficients.

    uv/ts select what the sponge touches (deck LuvSponge /
    LtracerSponge, read_phypar.F); amp_ts optionally gives the tracer
    factor its own field (grid-file diff_factor vs visc_factor)."""
    kw = {name: getattr(grid, name) for name in Grid.FIELDS}
    kw.update({name: getattr(grid, name) for name in Grid.AUX})
    if uv:
        kw["visc2_r"] = kw["visc2_r"] * amp
        kw["visc2_p"] = kw["visc2_p"] * amp
    if ts:
        a = amp if amp_ts is None else amp_ts
        kw["diff2"] = kw["diff2"] * a[None]
    return Grid(**kw)
