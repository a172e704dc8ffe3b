"""Vertical mass flux (S-coordinate "omega" velocity).

ROMS/Nonlinear/omega.F:200-345: integrate the horizontal mass-flux
divergence up from the bottom, then subtract the moving-coordinate drift so
W vanishes at the free surface.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import stencil as st
from . import boundary


def omega(cfg: ModelConfig, grid, Huon, Hvom, z_w):
    """Return W at interfaces (N+1, Mj, Li); W[0] = W[N] = 0.

    div[k] = (Huon[i+1]-Huon[i]) + (Hvom[j+1]-Hvom[j]) at rho points.
    """
    div = (st.ip1(Huon) - Huon) + (st.jp1(Hvom) - Hvom)
    # Integrate from the bottom: W[k] = -sum_{m<=k} div[m]
    Wk = -jnp.cumsum(div, axis=0)
    zeros = jnp.zeros_like(Wk[:1])
    W = jnp.concatenate([zeros, Wk], axis=0)        # (N+1, Mj, Li)

    # Subtract the S-surface drift: wrk = W[N]/(z_w[N]-z_w[0]);
    # W[k] -= wrk*(z_w[k]-z_w[0]) (omega.F:292-303), exact zero at surface.
    wrk = W[-1] / (z_w[-1] - z_w[0])
    W = W - wrk[None] * (z_w - z_w[:1])
    W = W.at[-1].set(0.0)

    W = boundary.bc_rho(W, cfg.bc.zeta)
    return W


def wvelocity(cfg: ModelConfig, grid, u, v, W, z_r, z_w,
              DU_avg1, DV_avg1):
    """True vertical velocity for output (ROMS/Nonlinear/wvelocity.F).

    wvel = pm*pn*(W + drift correction) + 4th-order interpolation of the
    grid-slope contribution vert = u dz/dxi pm + v dz/deta pn.
    Returns (N+1, Mj, Li) at interfaces.
    """
    pm, pn = grid.pm, grid.pn
    pmn = pm * pn
    N = cfg.N

    # slope contribution at rho levels (wvelocity.F:110-135)
    wrku = u * (z_r - st.im1(z_r)) * (pm + st.im1(pm))
    wrkv = v * (z_r - st.jm1(z_r)) * (pn + st.jm1(pn))
    if cfg.bc.ew_periodic:
        wrku = st.periodic_x(wrku)
    if cfg.bc.ns_periodic:
        wrkv = st.periodic_y(wrkv)
    vert = 0.25 * (wrku + st.ip1(wrku)) + 0.25 * (wrkv + st.jp1(wrkv))

    # barotropic drift correction (wvelocity.F:143-147)
    wrk = (DU_avg1 - st.ip1(DU_avg1) + DV_avg1 - st.jp1(DV_avg1)) / \
        (z_w[-1] - z_w[0])

    c1, c2, c3 = 3.0 / 8.0, 3.0 / 4.0, 1.0 / 8.0
    c4, c5 = 9.0 / 16.0, 1.0 / 16.0
    base = pmn[None] * (W + wrk[None] * (z_w - z_w[:1]))

    # 4th-order interface interpolation of vert (levels are 1-based in
    # the reference; vert[k] here is 0-based level k)
    wvel = jnp.zeros_like(W)
    slope_b = (z_r[0] - z_w[0]) / (z_r[1] - z_r[0])
    wvel = wvel.at[0].set(c1 * (vert[0] - slope_b * (vert[1] - vert[0]))
                          + c2 * vert[0] - c3 * vert[1])
    wvel = wvel.at[1].set(base[1] + c1 * vert[0] + c2 * vert[1]
                          - c3 * vert[2])
    interior = base[2:N - 1] + c4 * (vert[1:N - 2] + vert[2:N - 1]) \
        - c5 * (vert[0:N - 3] + vert[3:N])
    wvel = wvel.at[2:N - 1].set(interior)
    wvel = wvel.at[N - 1].set(base[N - 1] + c1 * vert[N - 1]
                              + c2 * vert[N - 2] - c3 * vert[N - 3])
    slope_t = (z_w[-1] - z_r[-1]) / (z_r[-1] - z_r[-2])
    wvel = wvel.at[N].set(
        pmn * wrk * (z_w[-1] - z_w[0])
        + c1 * (vert[-1] + slope_t * (vert[-1] - vert[-2]))
        + c2 * vert[-1] - c3 * vert[-2])

    return boundary.bc_rho(wvel, cfg.bc.zeta)
