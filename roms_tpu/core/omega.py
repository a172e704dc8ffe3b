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


def omega_split(cfg: ModelConfig, grid, Huon, Hvom, z_w):
    """OMEGA_IMPLICIT partition (omega.F:184-345, Shchepetkin 2015):
    split the vertical mass flux into an explicit part We whose vertical
    Courant number stays below amax (minus what horizontal advection
    already used), and an implicit remainder Wi handled by an upwind
    backward-Euler solve in the correctors.  Uses variant (1): Courant
    number and dz taken from the vertically-upstream cell.

    Returns (We, Wi), both (N+1, Mj, Li) with zero top/bottom rows.
    """
    amax = 0.75                          # omega.F:189
    amin = 0.60                          # omega.F:190
    cmnx_ratio = amin / amax
    cutoff = 2.0 - cmnx_ratio
    r4cmx = 1.0 / (4.0 - 4.0 * cmnx_ratio)

    W = omega(cfg, grid, Huon, Hvom, z_w)
    # horizontal outflux sum per cell (omega.F:235-239)
    Cu = (jnp.maximum(st.ip1(Huon), 0.0) - jnp.minimum(Huon, 0.0) +
          jnp.maximum(st.jp1(Hvom), 0.0) - jnp.minimum(Hvom, 0.0))
    dtpmn = (cfg.dt * grid.pm * grid.pn)[None]

    Wf = W[1:-1]                          # interior interfaces 1..N-1
    up = Wf >= 0.0
    c2d = jnp.where(up, Cu[:-1], Cu[1:])
    dh = jnp.where(up, z_w[1:-1] - z_w[:-2], z_w[2:] - z_w[1:-1])
    cw_max = amax * dh - c2d * dtpmn
    cw_max2 = cw_max * cw_max
    cw_min = cw_max * cmnx_ratio
    cw = jnp.abs(Wf) * dtpmn
    cff = jnp.where(cw <= cw_min, cw_max2,
                    jnp.where(cw <= cutoff * cw_max,
                              cw_max2 + r4cmx * (cw - cw_min) ** 2,
                              cw_max * cw))
    We_i = jnp.where((cw_max >= 0.0) & (cff > 0.0),
                     cw_max2 * Wf / jnp.where(cff > 0.0, cff, 1.0), 0.0)
    Wi_i = Wf - We_i
    z0 = jnp.zeros_like(We_i[:1])
    We = jnp.concatenate([z0, We_i, z0], axis=0)
    Wi = jnp.concatenate([z0, Wi_i, z0], axis=0)
    We = boundary.bc_rho(We, cfg.bc.zeta)
    Wi = boundary.bc_rho(Wi, cfg.bc.zeta)
    return We, Wi


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
