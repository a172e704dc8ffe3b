"""Horizontal harmonic mixing along s-surfaces (MIX_S_TS / MIX_S_UV).

Re-implements ROMS/Nonlinear/t3dmix2_s.h and uv3dmix2_s.h.  Both are
forward-Euler corrections applied to the (Hz-weighted) corrector seeds;
uv3dmix additionally feeds the vertically integrated stress divergence
into the 2D coupling forcing rufrc/rvfrc (uv3dmix2_s.h:200-222).

Biharmonic (t3dmix4/uv3dmix4) and rotated (geo/iso) variants arrive with
the wide-physics milestone.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st


def t3dmix2_s(cfg: ModelConfig, grid: Grid, t, t_part, Hz):
    """Add dt * harmonic diffusion of t(nrhs) to t_part (Hz*t units)."""
    if all(d == 0.0 for d in cfg.mixing.tnu2):
        return t_part
    dt = cfg.dt
    pmn = grid.pm * grid.pn
    out = []
    for itrc in range(cfg.NT):
        diff2 = grid.diff2[itrc]
        cffx = 0.25 * (diff2 + st.im1(diff2)) * grid.pmon_u
        cffe = 0.25 * (diff2 + st.jm1(diff2)) * grid.pnom_v
        FX = cffx * (Hz + st.im1(Hz)) * (t[itrc] - st.im1(t[itrc])) \
            * grid.umask
        FE = cffe * (Hz + st.jm1(Hz)) * (t[itrc] - st.jm1(t[itrc])) \
            * grid.vmask
        if cfg.bc.ew_periodic:
            FX = st.periodic_x(FX)
        if cfg.bc.ns_periodic:
            FE = st.periodic_y(FE)
        out.append(t_part[itrc] + dt * pmn * (st.dx_p(FX) + st.dy_p(FE)))
    return jnp.stack(out)


def uv3dmix2_s(cfg: ModelConfig, grid: Grid, u, v, u_part, v_part, Hz,
               rufrc, rvfrc):
    """Harmonic viscosity along s (uv3dmix2_s.h:120-222).

    Updates the momentum corrector seeds (Hz*u units) with
    dt*pmn_u*(stress divergence) and accumulates the same divergence
    into rufrc/rvfrc.  Returns (u_part, v_part, rufrc, rvfrc).
    """
    if cfg.mixing.visc2 <= 0.0:
        return u_part, v_part, rufrc, rvfrc
    dt = cfg.dt
    pn, pm = grid.pn, grid.pm
    upn = pn + st.im1(pn)
    upm = pm + st.im1(pm)
    vpn = pn + st.jm1(pn)
    vpm = pm + st.jm1(pm)

    # rho-point stress (diagonal)
    cff_r = Hz * 0.5 * (grid.pmon_r * st.dx_p(upn * u)
                        - grid.pnom_r * st.dy_p(vpm * v))
    UFx = grid.on_r * grid.on_r * grid.visc2_r * cff_r
    VFe = grid.om_r * grid.om_r * grid.visc2_r * cff_r
    # psi-point stress (off-diagonal)
    Hz_p = 0.25 * (Hz + st.im1(Hz) + st.jm1(Hz) + st.im1jm1(Hz))
    cff_p = 0.5 * Hz_p * (grid.pmon_p * st.dx_m(vpn * v)
                          + grid.pnom_p * st.dy_m(upm * u)) * grid.pmask
    UFe = grid.om_p * grid.om_p * grid.visc2_p * cff_p
    VFx = grid.on_p * grid.on_p * grid.visc2_p * cff_p
    if cfg.bc.ew_periodic:
        UFx = st.periodic_x(UFx)
        VFe = st.periodic_x(VFe)
        UFe = st.periodic_x(UFe)
        VFx = st.periodic_x(VFx)
    if cfg.bc.ns_periodic:
        UFx = st.periodic_y(UFx)
        VFe = st.periodic_y(VFe)
        UFe = st.periodic_y(UFe)
        VFx = st.periodic_y(VFx)

    div_u = 0.5 * upn * st.dx_m(UFx) + 0.5 * upm * (st.jp1(UFe) - UFe)
    div_v = 0.5 * vpn * (st.ip1(VFx) - VFx) - 0.5 * vpm * st.dy_m(VFe)

    u_part = u_part + dt * 0.25 * upm * upn * div_u
    v_part = v_part + dt * 0.25 * vpm * vpn * div_v
    rufrc = rufrc + jnp.sum(div_u, axis=0)
    rvfrc = rvfrc + jnp.sum(div_v, axis=0)
    return u_part, v_part, rufrc, rvfrc
