"""Multivariate balance operator for the background covariance.

Re-implements the reference's 4D-Var balance operator
(ROMS/Utility/zeta_balance.F + tl_balance/ad_balance): the control
vector holds UNBALANCED increments; the balance operator rebuilds the
full multivariate increment so that a temperature increment implies
dynamically consistent salinity, free-surface and geostrophic velocity
increments:

  dS    = dS_unbal + fac * dT          (T-S relation from background
                                        vertical gradients)
  drho  = EOS-linearized density increment
  dzeta = dzeta_unbal - (1/rho0) integral drho dz
                                        (level-of-no-motion hydrostatic
                                         option of zeta_balance.F)
  du,dv = geostrophic shear from the balanced pressure increment
          (masked where |f| < fmin)

Used as K in B = K B_u K^T: apply after the diffusion smoother
(make_bsqrt) so the smoothed unbalanced controls produce balanced
multivariate structures — exactly the reference's composition
(tl_balance called inside the B^1/2 sweeps of the 4D-Var drivers).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants
from ..config import ModelConfig
from ..ops import stencil as st
from .i4dvar import Control

_EPS = 1.0e-14


def make_balance(cfg: ModelConfig, grid, state_b, fmin: float = 1.0e-6):
    """Build the balance operator K about background state_b.

    Returns balance(ctrl_unbalanced: Control) -> Control (full).
    """
    Hz_b = state_b.Hz
    z_r_b = state_b.z_r
    t_b = state_b.t
    g = constants.g
    rho0 = cfg.rho0

    # T-S relation factor from background vertical gradients
    # (tl_balance.F dTdz/dSdz regression), clipped for stability.
    if cfg.NT > 1:
        dT_dz = jnp.gradient(t_b[0], axis=0) / \
            jnp.maximum(jnp.gradient(z_r_b, axis=0), _EPS)
        dS_dz = jnp.gradient(t_b[1], axis=0) / \
            jnp.maximum(jnp.gradient(z_r_b, axis=0), _EPS)
        fac_TS = jnp.clip(dS_dz / jnp.where(jnp.abs(dT_dz) > 1e-8,
                                            dT_dz, jnp.inf),
                          -2.0, 2.0)
    else:
        fac_TS = None

    # linearized EOS coefficients
    if cfg.eos.linear:
        drho_dT = -cfg.eos.R0 * cfg.eos.Tcoef
        drho_dS = cfg.eos.R0 * cfg.eos.Scoef
    else:
        from ..core.rho_eos import eos_alpha_beta
        alpha, beta, _ = eos_alpha_beta(cfg, t_b, z_r_b, all_levels=True)
        drho_dT = -alpha * cfg.rho0
        drho_dS = beta * cfg.rho0

    f = grid.f
    pm, pn = grid.pm, grid.pn

    def balance(ctrl: Control) -> Control:
        dT = ctrl.t[0]
        if cfg.NT > 1 and fac_TS is not None:
            dS = ctrl.t[1] + fac_TS * dT
            t_full = ctrl.t.at[1].set(dS)
        else:
            dS = None
            t_full = ctrl.t
        drho = drho_dT * dT
        if dS is not None:
            drho = drho + drho_dS * dS

        # balanced free surface: hydrostatic level-of-no-motion
        # integral (zeta_balance.F option 1)
        dzeta_bal = -jnp.sum(drho * Hz_b, axis=0) / rho0
        dzeta = ctrl.zeta + dzeta_bal

        # balanced geostrophic velocities from the pressure increment
        # dP(k) = g*dzeta + (g/rho0) * int_z^0 drho dz'
        csum = jnp.cumsum((drho * Hz_b)[::-1], axis=0)[::-1]
        dP = g * dzeta[None] + (g / rho0) * csum
        f_u = 0.5 * (f + st.im1(f))
        f_v = 0.5 * (f + st.jm1(f))
        inv_fu = jnp.where(jnp.abs(f_u) > fmin, 1.0 / f_u, 0.0)
        inv_fv = jnp.where(jnp.abs(f_v) > fmin, 1.0 / f_v, 0.0)
        # u = -(1/f) dP/dy at u points; v = (1/f) dP/dx at v points
        dP_dy = (dP - st.jm1(dP)) * pn[None]        # at v points
        dP_dx = (dP - st.im1(dP)) * pm[None]        # at u points
        du_bal = -inv_fu[None] * 0.5 * (dP_dy + st.jp1(st.im1(dP_dy)))
        dv_bal = inv_fv[None] * 0.5 * (dP_dx + st.ip1(st.jm1(dP_dx)))
        du = ctrl.u + du_bal * grid.umask[None]
        dv = ctrl.v + dv_bal * grid.vmask[None]
        return Control(zeta=dzeta, u=du, v=dv, t=t_full)

    return balance


def make_balanced_bsqrt(cfg, grid, state_b, sigmas: Control,
                        smooth: int = 2):
    """B^1/2 = K . (diffusion smoother): the composition the reference
    uses in its 4D-Var drivers (convolve + tl_balance)."""
    from .i4dvar import make_bsqrt
    bsq = make_bsqrt(sigmas, smooth)
    K = make_balance(cfg, grid, state_b)

    def bsqrt(v: Control) -> Control:
        return K(bsq(v))

    return bsqrt
