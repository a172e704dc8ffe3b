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
