"""Vertical (surface/bottom) boundary fluxes for momentum and tracers.

Re-implements ROMS/Nonlinear/set_vbc.F for the drag laws used by the
idealized and benchmark applications: linear (UV_LDRAG), quadratic
(UV_QDRAG) and logarithmic (UV_LOGDRAG), each with the reference's
0.75/dt momentum-sign limiter.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants
from ..config import ModelConfig
from ..ops import stencil as st


def bottom_drag(cfg: ModelConfig, grid, u, v, Hz, z_r=None, z_w=None):
    """Return kinematic bottom stress (bustr, bvstr) in m2/s2.

    u, v: (N, Mj, Li) at time nrhs; bottom level is k=0.
    """
    d = cfg.drag
    ub = u[0]
    vb = v[0]
    cff = 0.75 / cfg.dt
    Hz_u = st.avg_x(Hz[0])
    Hz_v = st.avg_y(Hz[0])

    if d.kind == "linear":
        # set_vbc.F "Set linear bottom stress":
        # bustr = rdrag * u(:,:,1), limited to 0.75/dt * Hz_u * |u|.
        bustr = d.rdrg * ub
        bvstr = d.rdrg * vb
    elif d.kind == "quadratic":
        v_at_u = 0.25 * (vb + st.jp1(vb) + st.im1(vb) + st.im1(st.jp1(vb)))
        u_at_v = 0.25 * (ub + st.ip1(ub) + st.jm1(ub) + st.jm1(st.ip1(ub)))
        bustr = d.rdrg2 * ub * jnp.sqrt(ub * ub + v_at_u * v_at_u)
        bvstr = d.rdrg2 * vb * jnp.sqrt(vb * vb + u_at_v * u_at_v)
    elif d.kind == "log":
        # set_vbc.F "Set logarithmic bottom stress".
        cff1 = 1.0 / jnp.log((z_r[0] - z_w[0]) / d.Zob)
        cd = jnp.clip(constants.vonKar ** 2 * cff1 * cff1,
                      d.Cdb_min, d.Cdb_max)
        cd_u = st.avg_x(cd)
        cd_v = st.avg_y(cd)
        v_at_u = 0.25 * (vb + st.jp1(vb) + st.im1(vb) + st.im1(st.jp1(vb)))
        u_at_v = 0.25 * (ub + st.ip1(ub) + st.jm1(ub) + st.jm1(st.ip1(ub)))
        bustr = cd_u * ub * jnp.sqrt(ub * ub + v_at_u * v_at_u)
        bvstr = cd_v * vb * jnp.sqrt(vb * vb + u_at_v * u_at_v)
    else:
        return jnp.zeros_like(ub), jnp.zeros_like(vb)

    # Sign-preserving limiter (set_vbc.F: bustr not allowed to reverse u).
    bustr = jnp.sign(bustr) * jnp.minimum(jnp.abs(bustr),
                                          jnp.abs(ub) * cff * Hz_u)
    bvstr = jnp.sign(bvstr) * jnp.minimum(jnp.abs(bvstr),
                                          jnp.abs(vb) * cff * Hz_v)
    return bustr, bvstr


def apply_iceshelf(cfg: ModelConfig, grid, u, v, z_r, z_w, forcing):
    """ICESHELF surface boundary conditions (set_vbc.F:423-560).

    Under the shelf (zice != 0): surface tracer fluxes and shortwave
    are zeroed, and the wind stress is replaced by the ice-cavity
    friction on the TOP level velocity — quadratic/linear per the
    drag configuration, a log-layer Cd for kind='log', stress zeroed
    otherwise.  Returns the modified Forcing."""
    zice = grid.zice
    under = zice != 0.0
    under_u = under & st.im1(under)       # zice(i)*zice(i-1) != 0
    under_v = under & st.jm1(under)

    stflx = jnp.where(under[None], 0.0, forcing.stflx)
    srflx = jnp.where(under, 0.0, forcing.srflx)

    ut, vt = u[-1], v[-1]
    kind = cfg.drag.kind
    if kind == "log":
        # log-layer Cd from the TOP-level height above the ice base
        # (set_vbc.F:455-461 with ZoBot)
        cff1 = 1.0 / jnp.log((z_w[-1] - z_r[-1]) / cfg.drag.Zob)
        cd = jnp.clip(constants.vonKar ** 2 * cff1 * cff1,
                      cfg.drag.Cdb_min, cfg.drag.Cdb_max)
        v_at_u = 0.25 * (vt + st.jp1(vt) + st.im1(vt)
                         + st.im1(st.jp1(vt)))
        u_at_v = 0.25 * (ut + st.ip1(ut) + st.jm1(ut)
                         + st.jm1(st.ip1(ut)))
        sustr_i = -0.5 * (st.im1(cd) + cd) * ut * \
            jnp.sqrt(ut * ut + v_at_u * v_at_u)
        svstr_i = -0.5 * (st.jm1(cd) + cd) * vt * \
            jnp.sqrt(u_at_v * u_at_v + vt * vt)
    elif kind == "quadratic":
        r2 = cfg.drag.rdrg2
        v_at_u = 0.25 * (vt + st.jp1(vt) + st.im1(vt)
                         + st.im1(st.jp1(vt)))
        u_at_v = 0.25 * (ut + st.ip1(ut) + st.jm1(ut)
                         + st.jm1(st.ip1(ut)))
        sustr_i = -r2 * ut * jnp.sqrt(ut * ut + v_at_u * v_at_u)
        svstr_i = -r2 * vt * jnp.sqrt(u_at_v * u_at_v + vt * vt)
    elif kind == "linear":
        sustr_i = -cfg.drag.rdrg * ut
        svstr_i = -cfg.drag.rdrg * vt
    else:
        sustr_i = jnp.zeros_like(ut)
        svstr_i = jnp.zeros_like(vt)

    sustr = jnp.where(under_u, sustr_i, forcing.sustr)
    svstr = jnp.where(under_v, svstr_i, forcing.svstr)
    return forcing._replace(sustr=sustr, svstr=svstr, stflx=stflx,
                            srflx=srflx)


def make_flux_correction(cfg: ModelConfig, sst_fld=None, dqdt_fld=None,
                         sss_fld=None, tnudg_s_days: float = 0.0,
                         salt_mode: str = "none"):
    """Surface-flux corrections (set_vbc.F:313-395).

    QCORRECTION (when sst_fld+dqdt_fld given):
        stflx[T] += dqdt * (SST_model - SST_data)      [dqdt < 0]
    salt_mode='scorrection' (SCORRECTION):
        stflx[S] = EmP*S_model - Tnudg*Hz_N*(S_model - SSS_data)
    salt_mode='srelaxation' (SRELAXATION):
        stflx[S] = -Tnudg*Hz_N*(S_model - SSS_data)

    The returned hook(time, t, Hz, forcing) -> forcing runs inside the
    step after the forcing function (Model flux_corr_fn).  Note the
    un-corrected salinity branch (stflx[S] = EmP*S_model) is handled
    by the forcing functions themselves; this hook only REPLACES the
    salt flux when a correction mode is active."""
    tnudg_s = (1.0 / (tnudg_s_days * 86400.0)) \
        if tnudg_s_days > 0.0 else 0.0

    def hook(time, t, Hz, forcing):
        stflx = forcing.stflx
        if sst_fld is not None and dqdt_fld is not None:
            sst_d = sst_fld.at(time).astype(stflx.dtype)
            dqdt = dqdt_fld.at(time).astype(stflx.dtype)
            stflx = stflx.at[0].add(dqdt * (t[0, -1] - sst_d))
        if cfg.NT > 1 and sss_fld is not None and \
                salt_mode in ("scorrection", "srelaxation"):
            sss_d = sss_fld.at(time).astype(stflx.dtype)
            relax = -tnudg_s * Hz[-1] * (t[1, -1] - sss_d)
            if salt_mode == "scorrection":
                stflx = stflx.at[1].set(stflx[1] + relax)
            else:
                stflx = stflx.at[1].set(relax)
        return forcing._replace(stflx=stflx)

    return hook
