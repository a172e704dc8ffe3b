"""Time-evolving depths and grid-box thicknesses.

Re-implements ROMS/Nonlinear/set_depth.F (Vtransform 1 and 2) in vectorized
JAX.  z_w has N+1 interfaces [k, j, i] with k=0 the bottom; z_r has N
mid-levels; Hz[k] = z_w[k+1] - z_w[k].
"""

from __future__ import annotations

import jax.numpy as jnp

from .grid import Grid


def set_depth(grid: Grid, zeta):
    """Compute (z_r, z_w, Hz) given free surface `zeta` at RHO points.

    Vtransform==1 (set_depth.F:147-179):
        Zo = hc*(s - C) + C*h;     z = Zo + zeta*(1 + Zo/h)
    Vtransform==2 (set_depth.F:192-226):
        Zo = (hc*s + C*h)/(hc + h); z = zeta + (zeta + h)*Zo
    """
    h = grid.h
    hc = grid.hc
    sc_r = grid.sc_r[:, None, None]
    Cs_r = grid.Cs_r[:, None, None]
    sc_w = grid.sc_w[1:, None, None]     # interior+surface interfaces
    Cs_w = grid.Cs_w[1:, None, None]

    vtransform = grid.Vtransform
    zice = getattr(grid, "zice", None)
    if zice is not None:
        # ICESHELF: the water column spans h - |zice|; stretch over it
        # and depress every level by the ice draft
        # (set_depth.F:161-178,205-226 zice branches)
        draft = jnp.abs(zice)
        hwater = h - draft
    else:
        hwater = h

    if vtransform == 1:
        z_w0 = hc * (sc_w - Cs_w) + Cs_w * hwater[None]
        z_r0 = hc * (sc_r - Cs_r) + Cs_r * hwater[None]
        z_w_up = z_w0 + zeta[None] * (1.0 + z_w0 / hwater[None])
        z_r = z_r0 + zeta[None] * (1.0 + z_r0 / hwater[None])
    else:
        hinv = 1.0 / (hc + hwater)[None]
        zo_w = (hc * sc_w + Cs_w * hwater[None]) * hinv
        zo_r = (hc * sc_r + Cs_r * hwater[None]) * hinv
        z_w_up = zeta[None] + (zeta + hwater)[None] * zo_w
        z_r = zeta[None] + (zeta + hwater)[None] * zo_r

    if zice is not None:
        z_w_up = z_w_up - draft[None]
        z_r = z_r - draft[None]

    z_w = jnp.concatenate([-h[None], z_w_up], axis=0)
    Hz = z_w[1:] - z_w[:-1]
    return z_r, z_w, Hz


def set_massflux(grid: Grid, u, v, Hz):
    """Horizontal mass fluxes Huon = Hz_u * u * on_u, Hvom = Hz_v * v * om_v.

    ROMS/Nonlinear/set_massflux.F:140-163.  u is a U-field [k, j, i] (valid
    i>=1), v a V-field (valid j>=1); ghost row/col 0 of the outputs is
    meaningless and must not be read.
    """
    Hz_u = 0.5 * (Hz + jnp.roll(Hz, 1, axis=-1))
    Hz_v = 0.5 * (Hz + jnp.roll(Hz, 1, axis=-2))
    Huon = Hz_u * u * grid.on_u[None]
    Hvom = Hz_v * v * grid.om_v[None]
    return Huon, Hvom
