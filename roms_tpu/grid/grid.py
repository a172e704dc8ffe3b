"""Curvilinear Arakawa C-grid container.

Array layout convention for the whole framework (TPU-first):
  - 2-D fields are `[eta, xi]` = `[j, i]`, xi innermost (TPU lane dim).
  - 3-D fields are `[k, j, i]`, k=0 at the bottom.
  - All fields use the same full shape (Mm+2, Lm+2) covering the physical
    domain plus the one-point boundary ring (reference rho indices
    i=0..Lm+1, j=0..Mm+1; ROMS/Modules/mod_param.F:162-230).  Staggered
    positions follow the reference convention: array value [j, i] of a
    U-field is the reference u(i,j) (valid i>=1, column 0 is a ghost), a
    V-field [j, i] is v(i,j) (valid j>=1, row 0 is a ghost), a PSI-field
    [j, i] is psi(i,j) (valid i>=1, j>=1).

This uniform-shape choice keeps every kernel's indexing identical across
staggers (critical for keeping the XLA program simple) at the cost of one
ghost row/column of dead storage per staggered field.

Metric combinations follow ROMS/Utility/metrics.F (om_u, on_u, pmon_r, ...).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from . import scoord


@jax.tree_util.register_pytree_node_class
class Grid:
    """Immutable pytree of grid arrays."""

    FIELDS = (
        "h", "pm", "pn", "f", "angler",
        "xr", "yr", "xu", "yu", "xv", "yv",
        "dndx", "dmde",
        "om_r", "on_r", "om_u", "on_u", "om_v", "on_v", "om_p", "on_p",
        "omn", "fomn",
        "pmon_r", "pnom_r", "pmon_p", "pnom_p", "pmon_u", "pnom_v",
        "rmask", "umask", "vmask", "pmask",
        "sc_r", "Cs_r", "sc_w", "Cs_w",
        "visc2_r", "visc2_p", "diff2",
        "visc4_r", "visc4_p", "diff4",
        # ICESHELF draft (m, nonzero under ice; None on shelf-free
        # grids — None is an empty pytree leaf, so it costs nothing)
        "zice",
    )
    AUX = ("hc", "Lm", "Mm", "N", "spherical", "Vtransform")

    def __init__(self, **kw):
        for name in self.FIELDS:
            setattr(self, name, kw[name])
        for name in self.AUX:
            setattr(self, name, kw[name])

    def tree_flatten(self):
        children = tuple(getattr(self, k) for k in self.FIELDS)
        aux = tuple(getattr(self, k) for k in self.AUX)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        kw = dict(zip(cls.FIELDS, children))
        kw.update(dict(zip(cls.AUX, aux)))
        return cls(**kw)


def _avg_u(a):
    """rho->u average: out[j,i] = 0.5*(a[j,i-1]+a[j,i]); ghost col 0 copied."""
    out = 0.5 * (a + jnp.roll(a, 1, axis=-1))
    return out.at[..., 0].set(a[..., 0])


def _avg_v(a):
    out = 0.5 * (a + jnp.roll(a, 1, axis=-2))
    return out.at[..., 0, :].set(a[..., 0, :])


def _avg_p(a):
    out = 0.25 * (a + jnp.roll(a, 1, axis=-1) + jnp.roll(a, 1, axis=-2)
                  + jnp.roll(jnp.roll(a, 1, axis=-1), 1, axis=-2))
    out = out.at[..., 0, :].set(a[..., 0, :])
    out = out.at[..., :, 0].set(a[..., :, 0])
    return out


def build_grid(cfg: ModelConfig, *, h, pm, pn, f,
               xr=None, yr=None, xu=None, yu=None, xv=None, yv=None,
               angler=None, rmask=None, dndx=None, dmde=None,
               spherical: bool = False, zice=None) -> Grid:
    """Assemble a Grid from rho-point primary fields.

    All inputs are (Mm+2, Lm+2) arrays at RHO points (boundary ring
    included); staggered metrics are derived exactly as in
    ROMS/Utility/metrics.F.
    """
    dtype = jnp.dtype(cfg.dtype)
    shp = cfg.shape2d

    def asf(x, default=None):
        if x is None:
            x = jnp.full(shp, default, dtype=dtype)
        return jnp.asarray(x, dtype=dtype)

    h = asf(h)
    pm = asf(pm)
    pn = asf(pn)
    f = asf(f)
    angler = asf(angler, 0.0)
    xr = asf(xr, 0.0)
    yr = asf(yr, 0.0)
    xu = asf(xu, 0.0)
    yu = asf(yu, 0.0)
    xv = asf(xv, 0.0)
    yv = asf(yv, 0.0)
    rmask = asf(rmask, 1.0)

    # Land/sea masks at staggered points (ROMS/Utility/set_masks.F):
    # umask = rmask(i-1)*rmask(i); vmask = rmask(j-1)*rmask(j);
    # pmask from the 4 surrounding rho masks.
    umask = rmask * jnp.roll(rmask, 1, axis=-1)
    umask = umask.at[..., 0].set(rmask[..., 0])
    vmask = rmask * jnp.roll(rmask, 1, axis=-2)
    vmask = vmask.at[..., 0, :].set(rmask[..., 0, :])
    pmask = (rmask * jnp.roll(rmask, 1, axis=-1)
             * jnp.roll(rmask, 1, axis=-2)
             * jnp.roll(jnp.roll(rmask, 1, axis=-1), 1, axis=-2))
    pmask = pmask.at[0, :].set(1.0).at[:, 0].set(1.0) * 1.0

    om_r = 1.0 / pm
    on_r = 1.0 / pn
    omn = 1.0 / (pm * pn)
    fomn = f * omn

    pm_u = _avg_u(pm)
    pn_u = _avg_u(pn)
    pm_v = _avg_v(pm)
    pn_v = _avg_v(pn)
    pm_p = _avg_p(pm)
    pn_p = _avg_p(pn)

    om_u = 1.0 / pm_u
    on_u = 1.0 / pn_u
    om_v = 1.0 / pm_v
    on_v = 1.0 / pn_v
    om_p = 1.0 / pm_p
    on_p = 1.0 / pn_p

    pmon_r = pm / pn
    pnom_r = pn / pm
    pmon_p = pm_p / pn_p
    pnom_p = pn_p / pm_p
    pmon_u = pm_u / pn_u
    pnom_v = pn_v / pm_v

    # Curvilinear correction terms (ana_grid.h:762-775): centered differences
    # of 1/pn, 1/pm at interior rho points; zero if not curvilinear.
    if dndx is None:
        if cfg.curvgrid:
            inv_pn = 1.0 / pn
            inv_pm = 1.0 / pm
            dndx = 0.5 * (jnp.roll(inv_pn, -1, axis=-1)
                          - jnp.roll(inv_pn, 1, axis=-1))
            dmde = 0.5 * (jnp.roll(inv_pm, -1, axis=-2)
                          - jnp.roll(inv_pm, 1, axis=-2))
            dndx = dndx.at[..., 0].set(0.0).at[..., -1].set(0.0)
            dmde = dmde.at[..., 0, :].set(0.0).at[..., -1, :].set(0.0)
        else:
            dndx = jnp.zeros(shp, dtype)
            dmde = jnp.zeros(shp, dtype)
    else:
        dndx = asf(dndx)
        dmde = asf(dmde)

    # Vertical coordinate tables (host-side float64 -> model dtype).
    sc_r_, Cs_r_, sc_w_, Cs_w_ = scoord.stretching(cfg.vert)
    hmin = float(np.min(np.asarray(h)))
    hc = scoord.compute_hc(cfg.vert, hmin)

    # Horizontal mixing coefficient fields (ROMS/Utility/ini_hmixcoef.F):
    # uniform values; sponge profiles can rescale these per-application.
    visc2_r = jnp.full(shp, cfg.mixing.visc2, dtype)
    visc2_p = jnp.full(shp, cfg.mixing.visc2, dtype)
    diff2 = jnp.stack([jnp.full(shp, t, dtype) for t in cfg.mixing.tnu2])
    # biharmonic kernels consume sqrt(coefficient) (inp_par.F semantics)
    visc4_r = jnp.full(shp, cfg.mixing.visc4 ** 0.5, dtype)
    visc4_p = jnp.full(shp, cfg.mixing.visc4 ** 0.5, dtype)
    diff4 = jnp.stack([jnp.full(shp, t ** 0.5, dtype)
                       for t in cfg.mixing.tnu4])

    return Grid(
        h=h, pm=pm, pn=pn, f=f, angler=angler,
        xr=xr, yr=yr, xu=xu, yu=yu, xv=xv, yv=yv,
        dndx=dndx, dmde=dmde,
        om_r=om_r, on_r=on_r, om_u=om_u, on_u=on_u,
        om_v=om_v, on_v=on_v, om_p=om_p, on_p=on_p,
        omn=omn, fomn=fomn,
        pmon_r=pmon_r, pnom_r=pnom_r, pmon_p=pmon_p, pnom_p=pnom_p,
        pmon_u=pmon_u, pnom_v=pnom_v,
        rmask=rmask, umask=umask, vmask=vmask, pmask=pmask,
        sc_r=jnp.asarray(sc_r_, dtype), Cs_r=jnp.asarray(Cs_r_, dtype),
        sc_w=jnp.asarray(sc_w_, dtype), Cs_w=jnp.asarray(Cs_w_, dtype),
        visc2_r=visc2_r, visc2_p=visc2_p, diff2=diff2,
        visc4_r=visc4_r, visc4_p=visc4_p, diff4=diff4,
        zice=(None if zice is None
              else jnp.asarray(zice, dtype=dtype)),
        hc=hc, Lm=cfg.Lm, Mm=cfg.Mm, N=cfg.N, spherical=spherical,
        Vtransform=cfg.vert.Vtransform,
    )
