"""Horizontal mixing: the full t3dmix/uv3dmix family.

Re-implements all ten reference variants: harmonic and biharmonic
tracer mixing along s-surfaces, geopotentials and isopycnals
(ROMS/Nonlinear/t3dmix{2,4}_{s,geo,iso}.h) and harmonic/biharmonic
momentum stress tensors along s and geopotential surfaces
(uv3dmix{2,4}.h + uv3dmix2_geo), plus Smagorinsky time-dependent
coefficients.  The harmonic forms are forward-Euler corrections applied
to the (Hz-weighted) corrector seeds; uv3dmix additionally feeds the
vertically integrated stress divergence into the 2D coupling forcing
rufrc/rvfrc (uv3dmix2_s.h:200-222).  The rotated (geo/iso) forms use
the reference's slope-limited triad construction.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st


def t3dmix2_s(cfg: ModelConfig, grid: Grid, t, t_part, Hz,
              diff3d_r=None):
    """Add dt * harmonic diffusion of t(nrhs) to t_part (Hz*t units)."""
    if all(d == 0.0 for d in cfg.mixing.tnu2) and diff3d_r is None:
        return t_part
    dt = cfg.dt
    pmn = grid.pm * grid.pn
    out = []
    for itrc in range(cfg.NT):
        diff2 = grid.diff2[itrc] if diff3d_r is None else diff3d_r
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
               rufrc, rvfrc, visc3d_r=None):
    """Harmonic viscosity along s (uv3dmix2_s.h:120-222).

    Updates the momentum corrector seeds (Hz*u units) with
    dt*pmn_u*(stress divergence) and accumulates the same divergence
    into rufrc/rvfrc.  Returns (u_part, v_part, rufrc, rvfrc).
    """
    if cfg.mixing.visc2 <= 0.0 and visc3d_r is None:
        return u_part, v_part, rufrc, rvfrc
    if visc3d_r is None:
        from ..ops import pallas_uvmix
        if pallas_uvmix.use_pallas_uvmix(cfg):
            # fused stress-divergence kernel (ops/pallas_uvmix.py)
            return pallas_uvmix.uv3dmix2_s_pallas(
                cfg, grid, u, v, u_part, v_part, Hz, rufrc, rvfrc,
                interpret=pallas_uvmix._interp())
    dt = cfg.dt
    pn, pm = grid.pn, grid.pm
    upn = pn + st.im1(pn)
    upm = pm + st.im1(pm)
    vpn = pn + st.jm1(pn)
    vpm = pm + st.jm1(pm)

    if visc3d_r is None:
        vr, vp = grid.visc2_r, grid.visc2_p
    else:
        # DIFF_3DCOEF branches of uv3dmix2_s.h: psi value is the 4-point
        # average of the rho coefficients
        vr = visc3d_r
        vp = 0.25 * (visc3d_r + st.im1(visc3d_r) + st.jm1(visc3d_r)
                     + st.im1jm1(visc3d_r))
    # rho-point stress (diagonal)
    cff_r = Hz * 0.5 * (grid.pmon_r * st.dx_p(upn * u)
                        - grid.pnom_r * st.dy_p(vpm * v))
    UFx = grid.on_r * grid.on_r * vr * cff_r
    VFe = grid.om_r * grid.om_r * vr * cff_r
    # psi-point stress (off-diagonal)
    Hz_p = 0.25 * (Hz + st.im1(Hz) + st.jm1(Hz) + st.im1jm1(Hz))
    cff_p = 0.5 * Hz_p * (grid.pmon_p * st.dx_m(vpn * v)
                          + grid.pnom_p * st.dy_m(upm * u)) * grid.pmask
    UFe = grid.om_p * grid.om_p * vp * cff_p
    VFx = grid.on_p * grid.on_p * vp * cff_p
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


def _lap_bc(cfg: ModelConfig, lbc, Lap):
    """Boundary treatment of the intermediate Laplacian for biharmonic
    operators (t3dmix4_s.h:233-290): closed edges zero it, open/gradient
    edges copy the interior; periodic edges wrap."""
    from ..config import CLOSED
    if cfg.bc.ew_periodic:
        Lap = st.periodic_x(Lap)
    else:
        wv = 0.0 if lbc.west == CLOSED else Lap[..., :, 1]
        ev = 0.0 if lbc.east == CLOSED else Lap[..., :, -2]
        Lap = Lap.at[..., :, 0].set(wv).at[..., :, -1].set(ev)
    if cfg.bc.ns_periodic:
        Lap = st.periodic_y(Lap)
    else:
        Lap = st.zero_south(Lap) if lbc.south == CLOSED \
            else st.clamp_south(Lap, row=1)
        Lap = st.zero_north(Lap) if lbc.north == CLOSED \
            else st.clamp_north(Lap, row=-2)
    return Lap


def t3dmix4_s(cfg: ModelConfig, grid: Grid, t, t_part, Hz):
    """Biharmonic tracer mixing along s (t3dmix4_s.h): the harmonic
    operator applied twice with sqrt(diff4) each pass."""
    if all(d == 0.0 for d in cfg.mixing.tnu4):
        return t_part
    dt = cfg.dt
    pmn = grid.pm * grid.pn
    out = []
    for itrc in range(cfg.NT):
        d4 = grid.diff4[itrc]
        cffx = 0.25 * (d4 + st.im1(d4)) * grid.pmon_u * grid.umask
        cffe = 0.25 * (d4 + st.jm1(d4)) * grid.pnom_v * grid.vmask

        def harm(q, with_hz_out):
            FX = cffx * (Hz + st.im1(Hz)) * (q - st.im1(q))
            FE = cffe * (Hz + st.jm1(Hz)) * (q - st.jm1(q))
            if cfg.bc.ew_periodic:
                FX = st.periodic_x(FX)
            if cfg.bc.ns_periodic:
                FE = st.periodic_y(FE)
            div = st.dx_p(FX) + st.dy_p(FE)
            return div

        Lap = pmn * harm(t[itrc], False) / Hz
        Lap = _lap_bc(cfg, cfg.bc.t, Lap)
        out.append(t_part[itrc] - dt * pmn * harm(Lap, True))
    return jnp.stack(out)


def uv3dmix4_s(cfg: ModelConfig, grid: Grid, u, v, u_part, v_part, Hz,
               rufrc, rvfrc):
    """Biharmonic viscosity along s (uv3dmix4_s.h): harmonic stress
    divergence applied twice; thickness weighting only on the second
    pass (as in step2d's 2D biharmonic, 'D appears only in the second
    operator')."""
    if cfg.mixing.visc4 <= 0.0:
        return u_part, v_part, rufrc, rvfrc
    dt = cfg.dt
    pn, pm = grid.pn, grid.pm
    upn = pn + st.im1(pn)
    upm = pm + st.im1(pm)
    vpn = pn + st.jm1(pn)
    vpm = pm + st.jm1(pm)
    Hz_p = 0.25 * (Hz + st.im1(Hz) + st.jm1(Hz) + st.im1jm1(Hz))

    def stress_div(uu, vv, with_hz):
        wr = Hz if with_hz else 1.0
        wp = Hz_p if with_hz else 1.0
        cff_r = wr * 0.5 * (grid.pmon_r * st.dx_p(upn * uu)
                            - grid.pnom_r * st.dy_p(vpm * vv)) \
            * grid.visc4_r
        cff_p = 0.5 * wp * (grid.pmon_p * st.dx_m(vpn * vv)
                            + grid.pnom_p * st.dy_m(upm * uu)) \
            * grid.visc4_p * grid.pmask
        UFx = grid.on_r * grid.on_r * cff_r
        VFe = grid.om_r * grid.om_r * cff_r
        UFe = grid.om_p * grid.om_p * cff_p
        VFx = grid.on_p * grid.on_p * cff_p
        if cfg.bc.ew_periodic:
            UFx, VFe = st.periodic_x(UFx), st.periodic_x(VFe)
            UFe, VFx = st.periodic_x(UFe), st.periodic_x(VFx)
        if cfg.bc.ns_periodic:
            UFx, VFe = st.periodic_y(UFx), st.periodic_y(VFe)
            UFe, VFx = st.periodic_y(UFe), st.periodic_y(VFx)
        du = 0.5 * upn * st.dx_m(UFx) + 0.5 * upm * (st.jp1(UFe) - UFe)
        dv = 0.5 * vpn * (st.ip1(VFx) - VFx) - 0.5 * vpm * st.dy_m(VFe)
        return du, dv

    LapU, LapV = stress_div(u, v, with_hz=False)
    # convert to velocity-like Laplacians and clamp at boundaries
    pmn_u = 0.25 * upm * upn
    pmn_v = 0.25 * vpm * vpn
    LapU = _lap_bc(cfg, cfg.bc.u, LapU * pmn_u)
    LapV = _lap_bc(cfg, cfg.bc.v, LapV * pmn_v)
    du, dv = stress_div(LapU, LapV, with_hz=True)
    # biharmonic: subtract
    u_part = u_part - dt * pmn_u * du
    v_part = v_part - dt * pmn_v * dv
    rufrc = rufrc - jnp.sum(du, axis=0)
    rvfrc = rvfrc - jnp.sum(dv, axis=0)
    return u_part, v_part, rufrc, rvfrc


def t3dmix2_geo(cfg: ModelConfig, grid: Grid, t, t_part, Hz, z_r):
    """Harmonic tracer diffusion rotated along geopotential surfaces
    (t3dmix2_geo.h): triad scheme with min/max upwinding of the slope
    terms; the vertical cross-flux FS closes the rotation."""
    if all(d == 0.0 for d in cfg.mixing.tnu2):
        return t_part
    dt = cfg.dt
    pmn = grid.pm * grid.pn
    pm_u = 0.5 * (grid.pm + st.im1(grid.pm)) * grid.umask
    pn_v = 0.5 * (grid.pn + st.jm1(grid.pn)) * grid.vmask

    dZdx = pm_u * (z_r - st.im1(z_r))            # (N, Mj, Li) u pts
    dZde = pn_v * (z_r - st.jm1(z_r))
    if cfg.bc.ew_periodic:
        dZdx = st.periodic_x(dZdx)
    if cfg.bc.ns_periodic:
        dZde = st.periodic_y(dZde)

    if _use_pallas(cfg):
        from ..ops import pallas_hmix
        divs = pallas_hmix.rot_div_geo_batched(
            cfg, grid, t, [grid.diff2[i] for i in range(cfg.NT)],
            Hz, z_r, interpret=_pallas_interpret())
        return t_part + dt * divs

    out = []
    for itrc in range(cfg.NT):
        div = _rot_div_geo(cfg, grid, t[itrc], grid.diff2[itrc],
                           Hz, z_r, dZdx, dZde)
        out.append(t_part[itrc] + dt * div)
    return jnp.stack(out)


def _use_pallas(cfg: ModelConfig) -> bool:
    if cfg.bc.ns_periodic:
        return False
    from ..ops import pallas_hmix
    return pallas_hmix.use_pallas_hmix(cfg)


def _pallas_interpret() -> bool:
    return os.environ.get("ROMS_TPU_PALLAS_HMIX_INTERPRET", "") == "1"


def _rot_div_geo(cfg: ModelConfig, grid: Grid, q, d2, Hz, z_r,
                 dZdx, dZde):
    """Rotated (geopotential) flux divergence of one tracer field,
    Hz-weighted per unit time (t3dmix2_geo.h:205-290 triad kernel);
    shared by the harmonic and biharmonic operators."""
    pmn = grid.pm * grid.pn
    pm_u = 0.5 * (grid.pm + st.im1(grid.pm)) * grid.umask
    pn_v = 0.5 * (grid.pn + st.jm1(grid.pn)) * grid.vmask
    cff_u = 0.25 * (d2 + st.im1(d2)) * grid.on_u
    cff_v = 0.25 * (d2 + st.jm1(d2)) * grid.om_v
    dTdx = pm_u * (q - st.im1(q))
    dTde = pn_v * (q - st.jm1(q))
    if cfg.bc.ew_periodic:
        dTdx = st.periodic_x(dTdx)
    if cfg.bc.ns_periodic:
        dTde = st.periodic_y(dTde)
    dTdz_i = (q[1:] - q[:-1]) / (z_r[1:] - z_r[:-1])
    zz = jnp.zeros_like(dTdz_i[:1])
    dTdz = jnp.concatenate([zz, dTdz_i, zz], axis=0)   # (N+1,...)

    # horizontal fluxes with slope correction (t3dmix2_geo.h:205-245)
    mnZ = jnp.minimum(dZdx, 0.0)
    mxZ = jnp.maximum(dZdx, 0.0)
    FX = cff_u * (Hz + st.im1(Hz)) * (
        dTdx - 0.5 * (mnZ * (st.im1(dTdz)[:-1] + dTdz[1:])
                      + mxZ * (st.im1(dTdz)[1:] + dTdz[:-1])))
    mnZe = jnp.minimum(dZde, 0.0)
    mxZe = jnp.maximum(dZde, 0.0)
    FE = cff_v * (Hz + st.jm1(Hz)) * (
        dTde - 0.5 * (mnZe * (st.jm1(dTdz)[:-1] + dTdz[1:])
                      + mxZe * (st.jm1(dTdz)[1:] + dTdz[:-1])))
    if cfg.bc.ew_periodic:
        FX = st.periodic_x(FX)
    if cfg.bc.ns_periodic:
        FE = st.periodic_y(FE)

    # vertical cross-flux at interior interfaces kk=1..N-1
    # (t3dmix2_geo.h:248-278)
    c = 0.5 * d2
    dTz = dTdz[1:-1]                              # (N-1,...)
    c1 = jnp.minimum(dZdx[:-1], 0.0)              # layer kk-1
    c2 = jnp.minimum(st.ip1(dZdx)[1:], 0.0)       # layer kk, i+1
    c3 = jnp.maximum(dZdx[1:], 0.0)
    c4 = jnp.maximum(st.ip1(dZdx)[:-1], 0.0)
    FS = c * (c1 * (c1 * dTz - dTdx[:-1])
              + c2 * (c2 * dTz - st.ip1(dTdx)[1:])
              + c3 * (c3 * dTz - dTdx[1:])
              + c4 * (c4 * dTz - st.ip1(dTdx)[:-1]))
    e1 = jnp.minimum(dZde[:-1], 0.0)
    e2 = jnp.minimum(st.jp1(dZde)[1:], 0.0)
    e3 = jnp.maximum(dZde[1:], 0.0)
    e4 = jnp.maximum(st.jp1(dZde)[:-1], 0.0)
    FS = FS + c * (e1 * (e1 * dTz - dTde[:-1])
                   + e2 * (e2 * dTz - st.jp1(dTde)[1:])
                   + e3 * (e3 * dTz - dTde[1:])
                   + e4 * (e4 * dTz - st.jp1(dTde)[:-1]))
    FSfull = jnp.concatenate([zz, FS, zz], axis=0)
    return pmn * (st.dx_p(FX) + st.dy_p(FE)) + (FSfull[1:] - FSfull[:-1])


def t3dmix4_geo(cfg: ModelConfig, grid: Grid, t, t_part, Hz, z_r):
    """Biharmonic tracer mixing rotated along geopotentials
    (t3dmix4_geo.h): the rotated harmonic triad operator applied twice
    with sqrt(tnu4) each pass, intermediate Laplacian boundary-treated
    like the along-s biharmonic."""
    if all(d == 0.0 for d in cfg.mixing.tnu4):
        return t_part
    dt = cfg.dt
    pm_u = 0.5 * (grid.pm + st.im1(grid.pm)) * grid.umask
    pn_v = 0.5 * (grid.pn + st.jm1(grid.pn)) * grid.vmask
    dZdx = pm_u * (z_r - st.im1(z_r))
    dZde = pn_v * (z_r - st.jm1(z_r))
    if cfg.bc.ew_periodic:
        dZdx = st.periodic_x(dZdx)
    if cfg.bc.ns_periodic:
        dZde = st.periodic_y(dZde)
    d4s = [grid.diff4[i] for i in range(cfg.NT)]
    if _use_pallas(cfg):
        from ..ops import pallas_hmix
        interp = _pallas_interpret()
        Laps = pallas_hmix.rot_div_geo_batched(
            cfg, grid, t, d4s, Hz, z_r, interpret=interp) / Hz
        Laps = jnp.stack([_lap_bc(cfg, cfg.bc.t, Laps[i])
                          for i in range(cfg.NT)])
        return t_part - dt * pallas_hmix.rot_div_geo_batched(
            cfg, grid, Laps, d4s, Hz, z_r, interpret=interp)

    out = []
    for itrc in range(cfg.NT):
        d4 = d4s[itrc]
        Lap = _rot_div_geo(cfg, grid, t[itrc], d4, Hz, z_r,
                           dZdx, dZde) / Hz
        Lap = _lap_bc(cfg, cfg.bc.t, Lap)
        out.append(t_part[itrc] - dt * _rot_div_geo(
            cfg, grid, Lap, d4, Hz, z_r, dZdx, dZde))
    return jnp.stack(out)


def t3dmix2_iso(cfg: ModelConfig, grid: Grid, t, t_part, Hz, z_r,
                pden):
    """Harmonic tracer diffusion rotated along isopycnic (epineutral)
    surfaces (t3dmix2_iso.h): the same triad stencil as the
    geopotential rotation, but with the mixing direction defined by the
    potential-density gradients.  dTdr = dT/drho at interfaces with the
    stratification floored at eps (t3dmix2_iso.h:295-341); the triad
    min/max branches swap sign relative to _geo because rho decreases
    upward while z increases."""
    if all(d == 0.0 for d in cfg.mixing.tnu2):
        return t_part
    dt = cfg.dt
    # TS_MIX_MAX_SLOPE limiting (t3dmix2_iso.h:193, 304-310); see
    # _iso_slope_ctx
    ctx = _iso_slope_ctx(cfg, grid, z_r, pden)
    out = []
    for itrc in range(cfg.NT):
        div = _rot_div_iso(cfg, grid, t[itrc], grid.diff2[itrc], Hz,
                           ctx)
        out.append(t_part[itrc] + dt * div)
    return jnp.stack(out)


def _iso_slope_ctx(cfg: ModelConfig, grid: Grid, z_r, pden):
    """Shared isopycnal-direction quantities (gradients + limited
    stratification factor), used by both iso operators.

    The weak-stratification limiter follows the reference's three CPP
    branches via cfg.mixing.ts_mix_limit (t3dmix2_iso.h:188-324):
    'eps' floors the per-layer density jump at eps=0.5 kg/m3 — NOT an
    epsilon: in weak stratification the rotation degrades gracefully
    toward s-surface diffusion instead of diverging (a tiny floor
    makes the vertical triad flux ~dz/drho blow up on a
    vertically-uniform front, e.g. the OVERFLOW initial state);
    'max_slope' keeps the small=1e-14 floor but caps the slope
    (TS_MIX_MAX_SLOPE, :304-312); 'min_strat' enforces a minimum
    d(rho)/dz of 0.1 kg/m4 (TS_MIX_MIN_STRAT, :313-316)."""
    limit = getattr(cfg.mixing, "ts_mix_limit", "eps")
    pm_u = 0.5 * (grid.pm + st.im1(grid.pm)) * grid.umask
    pn_v = 0.5 * (grid.pn + st.jm1(grid.pn)) * grid.vmask
    Rx = pm_u * (pden - st.im1(pden))
    Re = pn_v * (pden - st.jm1(pden))
    if cfg.bc.ew_periodic:
        Rx = st.periodic_x(Rx)
    if cfg.bc.ns_periodic:
        Re = st.periodic_y(Re)
    if limit == "max_slope":
        slope_max = 1.0e-4
        gradR = jnp.sqrt(Rx[1:] ** 2 + st.ip1(Rx)[1:] ** 2 +
                         Rx[:-1] ** 2 + st.ip1(Rx)[:-1] ** 2 +
                         Re[1:] ** 2 + st.jp1(Re)[1:] ** 2 +
                         Re[:-1] ** 2 + st.jp1(Re)[:-1] ** 2)
        slope_floor = 0.25 * slope_max * (z_r[1:] - z_r[:-1]) * gradR
        drho = jnp.maximum(jnp.maximum(pden[:-1] - pden[1:], 1.0e-14),
                           slope_floor)
    elif limit == "min_strat":
        strat_min = 0.1
        drho = jnp.maximum(pden[:-1] - pden[1:],
                           strat_min * (z_r[1:] - z_r[:-1]))
    else:                                   # 'eps' (reference default)
        drho = jnp.maximum(pden[:-1] - pden[1:], 0.5)
    cffr = -1.0 / drho
    Ffac_i = cffr * (z_r[1:] - z_r[:-1])
    zz = jnp.zeros_like(cffr[:1])
    return (pm_u, pn_v, Rx, Re, cffr, Ffac_i, zz)


def _rot_div_iso(cfg: ModelConfig, grid: Grid, q, d2, Hz, ctx):
    """Isopycnally-rotated flux divergence of one field, Hz-weighted
    per unit time (t3dmix2_iso.h triad kernel)."""
    pm_u, pn_v, Rx, Re, cffr, Ffac_i, zz = ctx
    pmn = grid.pm * grid.pn
    cff_u = 0.25 * (d2 + st.im1(d2)) * grid.on_u
    cff_v = 0.25 * (d2 + st.jm1(d2)) * grid.om_v
    Tx = pm_u * (q - st.im1(q))
    Te = pn_v * (q - st.jm1(q))
    if cfg.bc.ew_periodic:
        Tx = st.periodic_x(Tx)
    if cfg.bc.ns_periodic:
        Te = st.periodic_y(Te)
    D = jnp.concatenate([zz, cffr * (q[1:] - q[:-1]), zz], axis=0)

    mxR = jnp.maximum(Rx, 0.0)
    mnR = jnp.minimum(Rx, 0.0)
    FX = cff_u * (Hz + st.im1(Hz)) * (
        Tx - 0.5 * (mxR * (st.im1(D)[:-1] + D[1:])
                    + mnR * (st.im1(D)[1:] + D[:-1])))
    mxRe = jnp.maximum(Re, 0.0)
    mnRe = jnp.minimum(Re, 0.0)
    FE = cff_v * (Hz + st.jm1(Hz)) * (
        Te - 0.5 * (mxRe * (st.jm1(D)[:-1] + D[1:])
                    + mnRe * (st.jm1(D)[1:] + D[:-1])))
    if cfg.bc.ew_periodic:
        FX = st.periodic_x(FX)
    if cfg.bc.ns_periodic:
        FE = st.periodic_y(FE)

    Dw = D[1:-1]
    c1 = jnp.maximum(Rx[:-1], 0.0)
    c2 = jnp.maximum(st.ip1(Rx)[1:], 0.0)
    c3 = jnp.minimum(Rx[1:], 0.0)
    c4 = jnp.minimum(st.ip1(Rx)[:-1], 0.0)
    FS = (c1 * (c1 * Dw - Tx[:-1])
          + c2 * (c2 * Dw - st.ip1(Tx)[1:])
          + c3 * (c3 * Dw - Tx[1:])
          + c4 * (c4 * Dw - st.ip1(Tx)[:-1]))
    e1 = jnp.maximum(Re[:-1], 0.0)
    e2 = jnp.maximum(st.jp1(Re)[1:], 0.0)
    e3 = jnp.minimum(Re[1:], 0.0)
    e4 = jnp.minimum(st.jp1(Re)[:-1], 0.0)
    FS = FS + (e1 * (e1 * Dw - Te[:-1])
               + e2 * (e2 * Dw - st.jp1(Te)[1:])
               + e3 * (e3 * Dw - Te[1:])
               + e4 * (e4 * Dw - st.jp1(Te)[:-1]))
    FS = 0.5 * d2[None] * FS * Ffac_i
    FSfull = jnp.concatenate([zz, FS, zz], axis=0)
    return pmn * (st.dx_p(FX) + st.dy_p(FE)) + (FSfull[1:] - FSfull[:-1])


def t3dmix4_iso(cfg: ModelConfig, grid: Grid, t, t_part, Hz, z_r,
                pden):
    """Biharmonic tracer mixing rotated along isopycnals
    (t3dmix4_iso.h): the rotated harmonic triad applied twice with
    sqrt(tnu4) each pass."""
    if all(d == 0.0 for d in cfg.mixing.tnu4):
        return t_part
    dt = cfg.dt
    ctx = _iso_slope_ctx(cfg, grid, z_r, pden)
    out = []
    for itrc in range(cfg.NT):
        d4 = grid.diff4[itrc]
        Lap = _rot_div_iso(cfg, grid, t[itrc], d4, Hz, ctx) / Hz
        Lap = _lap_bc(cfg, cfg.bc.t, Lap)
        out.append(t_part[itrc] - dt * _rot_div_iso(cfg, grid, Lap,
                                                    d4, Hz, ctx))
    return jnp.stack(out)


def smagorinsky_coef(cfg: ModelConfig, grid: Grid, u, v):
    """Deformation-rate-dependent 3-D mixing coefficients
    (hmixing.F:288-320, UV_VIS2 branch):

        DefRate = sqrt((du/dx)^2 + (dv/dy)^2 + 0.5*(dv/dx + du/dy)^2)
        visc3d  = visc2 + SmagorCoef * dx*dy * DefRate

    Returns (visc3d_r, diff3d_r) at rho points (N, Mj, Li)."""
    pm, pn = grid.pm, grid.pn
    dudx = (st.ip1(u) - u) * pm[None]
    dvdy = (st.jp1(v) - v) * pn[None]
    cross = (0.25 * pn[None] * (st.jp1(u) + st.ip1(st.jp1(u))
                                - st.jm1(u) - st.ip1(st.jm1(u)))
             + 0.25 * pm[None] * (st.ip1(v) + st.ip1(st.jp1(v))
                                  - st.im1(v) - st.im1(st.jp1(v))))
    Def = jnp.sqrt(dudx ** 2 + dvdy ** 2 + 0.5 * cross ** 2)
    if cfg.bc.ew_periodic:
        Def = st.periodic_x(Def)
    if cfg.bc.ns_periodic:
        Def = st.periodic_y(Def)
    add = cfg.mixing.smagor_coef * (1.0 / (pm * pn))[None] * Def
    visc3d = cfg.mixing.visc2 + add
    diff3d = cfg.mixing.tnu2[0] + add
    return visc3d * grid.rmask[None], diff3d * grid.rmask[None]


def uv3dmix2_geo(cfg: ModelConfig, grid: Grid, u, v, u_part, v_part,
                 Hz, z_r, rufrc, rvfrc, visc3d_r=None):
    """Harmonic momentum viscosity rotated along geopotential surfaces
    (uv3dmix2_geo.h): tension stress at rho points, shear stress at
    psi points, each with the min/max slope-triad correction of the
    lateral gradients by the vertical shear, plus the vertical
    cross-flux terms UFs/VFs closing the rotation.

    Follows the reference k1/k2 ring resolved into whole-array level
    (N,...) and interface (N+1,...) tensors.  Returns updated
    (u_part, v_part, rufrc, rvfrc) with u_part/v_part Hz-weighted.
    """
    if cfg.mixing.visc2 == 0.0 and visc3d_r is None:
        return u_part, v_part, rufrc, rvfrc
    dt = cfg.dt
    pm, pn = grid.pm, grid.pn
    N = u.shape[0]

    def px(q):
        return st.periodic_x(q) if cfg.bc.ew_periodic else q

    def py(q):
        return st.periodic_y(q) if cfg.bc.ns_periodic else q

    # ---- level-centred lateral gradients (uv3dmix2_geo.h:280-392) ------
    dZdx_u = px(0.5 * (pm + st.im1(pm))[None] * st.dx_m(z_r)
                * grid.umask[None])
    dZde_v = py(0.5 * (pn + st.jm1(pn))[None] * st.dy_m(z_r)
                * grid.vmask[None])
    dZdx_p = 0.5 * (st.jm1(dZdx_u) + dZdx_u)
    dZde_p = 0.5 * (st.im1(dZde_v) + dZde_v)
    dZdx_r = 0.5 * (dZdx_u + st.ip1(dZdx_u))
    dZde_r = 0.5 * (dZde_v + st.jp1(dZde_v))

    pnu = (pn + st.im1(pn))[None]
    pmu = (pm + st.im1(pm))[None]
    pnv = (pn + st.jm1(pn))[None]
    pmv = (pm + st.jm1(pm))[None]
    dnUdx = 0.5 * pm[None] * st.dx_p(px(pnu * u)) * grid.rmask[None]
    dmVde = 0.5 * pn[None] * st.dy_p(py(pmv * v)) * grid.rmask[None]
    pn4 = 0.125 * (pn + st.im1(pn) + st.jm1(pn)
                   + st.im1(st.jm1(pn)))[None]
    pm4 = 0.125 * (pm + st.im1(pm) + st.jm1(pm)
                   + st.im1(st.jm1(pm)))[None]
    dmUde = pn4 * st.dy_m(px(pmu * u)) * grid.pmask[None]
    dnVdx = pm4 * st.dx_m(py(pnv * v)) * grid.pmask[None]

    # ---- interface vertical shears, zero top/bottom (:420-455) ---------
    dz_u = 0.5 * ((z_r[1:] - z_r[:-1]) + st.im1(z_r[1:] - z_r[:-1]))
    dz_v = 0.5 * ((z_r[1:] - z_r[:-1]) + st.jm1(z_r[1:] - z_r[:-1]))
    z0u = jnp.zeros_like(u[:1])
    z0v = jnp.zeros_like(v[:1])
    dUdz = jnp.concatenate([z0u, (u[1:] - u[:-1]) / dz_u, z0u], axis=0)
    dVdz = jnp.concatenate([z0v, (v[1:] - v[:-1]) / dz_v, z0v], axis=0)

    if visc3d_r is not None:
        visc_r = visc3d_r
        visc_p = 0.25 * (visc_r + st.im1(visc_r) + st.jm1(visc_r)
                         + st.im1(st.jm1(visc_r)))
    else:
        visc_r = grid.visc2_r[None] * jnp.ones_like(Hz)
        visc_p = grid.visc2_p[None] * jnp.ones_like(Hz)

    # ---- horizontal stress fluxes per layer (:456-535) -----------------
    mnZxr = jnp.minimum(dZdx_r, 0.0)
    mxZxr = jnp.maximum(dZdx_r, 0.0)
    mnZer = jnp.minimum(dZde_r, 0.0)
    mxZer = jnp.maximum(dZde_r, 0.0)
    cff_r = Hz * (
        grid.on_r[None] * (dnUdx - 0.5 * pn[None] * (
            mnZxr * (dUdz[:-1] + st.ip1(dUdz[1:]))
            + mxZxr * (dUdz[1:] + st.ip1(dUdz[:-1]))))
        - grid.om_r[None] * (dmVde - 0.5 * pm[None] * (
            mnZer * (dVdz[:-1] + st.jp1(dVdz[1:]))
            + mxZer * (dVdz[1:] + st.jp1(dVdz[:-1]))))) * \
        grid.rmask[None]
    UFx = grid.on_r[None] ** 2 * visc_r * cff_r
    VFe = grid.om_r[None] ** 2 * visc_r * cff_r

    mnZxp = jnp.minimum(dZdx_p, 0.0)
    mxZxp = jnp.maximum(dZdx_p, 0.0)
    mnZep = jnp.minimum(dZde_p, 0.0)
    mxZep = jnp.maximum(dZde_p, 0.0)
    pm_p = 2.0 * pm4          # 0.25*(4-point sum), uv3dmix2_geo.h:495
    pn_p = 2.0 * pn4
    Hz_p = 0.25 * (Hz + st.im1(Hz) + st.jm1(Hz) + st.im1(st.jm1(Hz)))
    cff_p = Hz_p * (
        grid.on_p[None] * (dnVdx - 0.5 * pn_p * (
            mnZxp * (st.im1(dVdz)[:-1] + dVdz[1:])
            + mxZxp * (st.im1(dVdz)[1:] + dVdz[:-1])))
        + grid.om_p[None] * (dmUde - 0.5 * pm_p * (
            mnZep * (st.jm1(dUdz)[:-1] + dUdz[1:])
            + mxZep * (st.jm1(dUdz)[1:] + dUdz[:-1])))) * \
        grid.pmask[None]
    UFe = grid.om_p[None] ** 2 * visc_p * cff_p
    VFx = grid.on_p[None] ** 2 * visc_p * cff_p
    UFx, VFe = px(py(UFx)), px(py(VFe))
    UFe, VFx = px(py(UFe)), px(py(VFx))

    # ---- vertical cross-fluxes at interior interfaces (:536-700) -------
    visc_iu = 0.5 * (visc_r + st.im1(visc_r))
    visc_iv = 0.5 * (visc_r + st.jm1(visc_r))
    fac1u = 0.5 * (visc_iu[:-1] + visc_iu[1:]) * grid.on_u[None]
    fac2u = 0.5 * (visc_iu[:-1] + visc_iu[1:]) * grid.om_u[None]
    fac1v = 0.5 * (visc_iv[:-1] + visc_iv[1:]) * grid.on_v[None]
    fac2v = 0.5 * (visc_iv[:-1] + visc_iv[1:]) * grid.om_v[None]

    dUdz_i = dUdz[1:-1]                          # (N-1,...) interfaces
    dVdz_i = dVdz[1:-1]
    dVdz_at_u = 0.25 * (st.im1(st.jp1(dVdz_i)) + st.jp1(dVdz_i)
                        + st.im1(dVdz_i) + dVdz_i)
    dUdz_at_v = 0.25 * (dUdz_i + st.ip1(dUdz_i) + st.jm1(dUdz_i)
                        + st.jm1(st.ip1(dUdz_i)))
    dnUdz = 0.5 * pnu * dUdz_i
    dnVdz_u = 0.5 * pnu * dVdz_at_u
    dmUdz = 0.5 * pmu * dUdz_i
    dmVdz_u = 0.5 * pmu * dVdz_at_u
    dnUdz_v = 0.5 * pnv * dUdz_at_v
    dnVdz = 0.5 * pnv * dVdz_i
    dmUdz_v = 0.5 * pmv * dUdz_at_v
    dmVdz = 0.5 * pmv * dVdz_i

    def lo(q):      # level below interface w (w=1..N-1) -> q[:-1]
        return q[:-1]

    def hi(q):      # level above
        return q[1:]

    # UFsx: x-slope triads at u points (uv3dmix2_geo.h:565-604)
    c1 = jnp.minimum(st.im1(lo(dZdx_r)), 0.0)
    c2 = jnp.minimum(hi(dZdx_r), 0.0)
    c3 = jnp.maximum(st.im1(hi(dZdx_r)), 0.0)
    c4 = jnp.maximum(lo(dZdx_r), 0.0)
    UFsx = fac1u * (c1 * (c1 * dnUdz - st.im1(lo(dnUdx)))
                    + c2 * (c2 * dnUdz - hi(dnUdx))
                    + c3 * (c3 * dnUdz - st.im1(hi(dnUdx)))
                    + c4 * (c4 * dnUdz - lo(dnUdx)))
    e1 = jnp.minimum(lo(dZde_p), 0.0)
    e2 = jnp.minimum(st.jp1(hi(dZde_p)), 0.0)
    e3 = jnp.maximum(hi(dZde_p), 0.0)
    e4 = jnp.maximum(st.jp1(lo(dZde_p)), 0.0)
    UFse = fac2u * (e1 * (e1 * dmUdz - lo(dmUde))
                    + e2 * (e2 * dmUdz - st.jp1(hi(dmUde)))
                    + e3 * (e3 * dmUdz - hi(dmUde))
                    + e4 * (e4 * dmUdz - st.jp1(lo(dmUde))))
    f5 = jnp.minimum(lo(dZdx_p), 0.0)
    f6 = jnp.minimum(st.jp1(hi(dZdx_p)), 0.0)
    f7 = jnp.maximum(hi(dZdx_p), 0.0)
    f8 = jnp.maximum(st.jp1(lo(dZdx_p)), 0.0)
    UFsx = UFsx + fac1u * (e1 * (f5 * dnVdz_u - lo(dnVdx))
                           + e2 * (f6 * dnVdz_u - st.jp1(hi(dnVdx)))
                           + e3 * (f7 * dnVdz_u - hi(dnVdx))
                           + e4 * (f8 * dnVdz_u - st.jp1(lo(dnVdx))))
    g5 = jnp.minimum(st.im1(lo(dZde_r)), 0.0)
    g6 = jnp.minimum(hi(dZde_r), 0.0)
    g7 = jnp.maximum(st.im1(hi(dZde_r)), 0.0)
    g8 = jnp.maximum(lo(dZde_r), 0.0)
    UFse = UFse - fac2u * (c1 * (g5 * dmVdz_u - st.im1(lo(dmVde)))
                           + c2 * (g6 * dmVdz_u - hi(dmVde))
                           + c3 * (g7 * dmVdz_u - st.im1(hi(dmVde)))
                           + c4 * (g8 * dmVdz_u - lo(dmVde)))

    # VFsx/VFse at v points (:622-700)
    a1 = jnp.minimum(lo(dZdx_p), 0.0)
    a2 = jnp.minimum(st.ip1(hi(dZdx_p)), 0.0)
    a3 = jnp.maximum(hi(dZdx_p), 0.0)
    a4 = jnp.maximum(st.ip1(lo(dZdx_p)), 0.0)
    VFsx = fac1v * (a1 * (a1 * dnVdz - lo(dnVdx))
                    + a2 * (a2 * dnVdz - st.ip1(hi(dnVdx)))
                    + a3 * (a3 * dnVdz - hi(dnVdx))
                    + a4 * (a4 * dnVdz - st.ip1(lo(dnVdx))))
    b1 = jnp.minimum(st.jm1(lo(dZde_r)), 0.0)
    b2 = jnp.minimum(hi(dZde_r), 0.0)
    b3 = jnp.maximum(st.jm1(hi(dZde_r)), 0.0)
    b4 = jnp.maximum(lo(dZde_r), 0.0)
    VFse = fac2v * (b1 * (b1 * dmVdz - st.jm1(lo(dmVde)))
                    + b2 * (b2 * dmVdz - hi(dmVde))
                    + b3 * (b3 * dmVdz - st.jm1(hi(dmVde)))
                    + b4 * (b4 * dmVdz - lo(dmVde)))
    h5 = jnp.minimum(st.jm1(lo(dZdx_r)), 0.0)
    h6 = jnp.minimum(hi(dZdx_r), 0.0)
    h7 = jnp.maximum(st.jm1(hi(dZdx_r)), 0.0)
    h8 = jnp.maximum(lo(dZdx_r), 0.0)
    VFsx = VFsx - fac1v * (b1 * (h5 * dnUdz_v - st.jm1(lo(dnUdx)))
                           + b2 * (h6 * dnUdz_v - hi(dnUdx))
                           + b3 * (h7 * dnUdz_v - st.jm1(hi(dnUdx)))
                           + b4 * (h8 * dnUdz_v - lo(dnUdx)))
    k5 = jnp.minimum(lo(dZde_p), 0.0)
    k6 = jnp.minimum(st.ip1(hi(dZde_p)), 0.0)
    k7 = jnp.maximum(hi(dZde_p), 0.0)
    k8 = jnp.maximum(st.ip1(lo(dZde_p)), 0.0)
    VFse = VFse + fac2v * (a1 * (k5 * dmUdz_v - lo(dmUde))
                           + a2 * (k6 * dmUdz_v - st.ip1(hi(dmUde)))
                           + a3 * (k7 * dmUdz_v - hi(dmUde))
                           + a4 * (k8 * dmUdz_v - st.ip1(lo(dmUde))))

    z0u2 = jnp.zeros_like(UFsx[:1])
    z0v2 = jnp.zeros_like(VFsx[:1])
    UFsx = jnp.concatenate([z0u2, UFsx, z0u2], axis=0)
    UFse = jnp.concatenate([z0u2, UFse, z0u2], axis=0)
    VFsx = jnp.concatenate([z0v2, VFsx, z0v2], axis=0)
    VFse = jnp.concatenate([z0v2, VFse, z0v2], axis=0)

    # ---- time-step the stress divergence (:702-760) --------------------
    cff1u = 0.5 * pnu * st.dx_m(UFx)
    cff2u = 0.5 * pmu * st.dy_p(UFe)
    cff3u = UFsx[1:] - UFsx[:-1]
    cff4u = UFse[1:] - UFse[:-1]
    pmn_u = 0.25 * pmu * pnu
    u_part = u_part + dt * pmn_u * (cff1u + cff2u) \
        + dt * (cff3u + cff4u)
    rufrc = rufrc + jnp.sum(cff1u + cff2u + cff3u + cff4u, axis=0)

    cff1v = 0.5 * pnv * st.dx_p(VFx)
    cff2v = 0.5 * pmv * st.dy_m(VFe)
    cff3v = VFsx[1:] - VFsx[:-1]
    cff4v = VFse[1:] - VFse[:-1]
    pmn_v = 0.25 * pmv * pnv
    v_part = v_part + dt * pmn_v * (cff1v - cff2v) \
        + dt * (cff3v + cff4v)
    rvfrc = rvfrc + jnp.sum(cff1v - cff2v + cff3v + cff4v, axis=0)
    return u_part, v_part, rufrc, rvfrc


def uv3dmix4_geo(cfg: ModelConfig, grid: Grid, u, v, u_part, v_part,
                 Hz, z_r, rufrc, rvfrc, visc3d_r=None):
    """Biharmonic momentum viscosity rotated along geopotentials
    (uv3dmix4_geo.h): the rotated harmonic stress operator of
    uv3dmix2_geo applied twice with sqrt(VISC4) coefficients and the
    boundary clamp between passes.  (TPU-first composition: the first
    pass keeps the thickness weighting and converts back to velocity
    units, where the reference's hand-written first pass is
    unweighted — same operator to O(dHz), one code path.)"""
    if cfg.mixing.visc4 <= 0.0 and visc3d_r is None:
        return u_part, v_part, rufrc, rvfrc
    ones3 = jnp.ones_like(Hz)
    visc_r1 = visc3d_r if visc3d_r is not None \
        else grid.visc4_r[None] * ones3
    zu = jnp.zeros_like(u)
    zv = jnp.zeros_like(v)
    z2 = jnp.zeros_like(rufrc)
    up1, vp1, _, _ = uv3dmix2_geo(cfg, grid, u, v, zu, zv, Hz, z_r,
                                  z2, z2, visc3d_r=visc_r1)
    Hz_u = 0.5 * (Hz + st.im1(Hz))
    Hz_v = 0.5 * (Hz + st.jm1(Hz))
    LapU = _lap_bc(cfg, cfg.bc.u, up1 / (cfg.dt * Hz_u))
    LapV = _lap_bc(cfg, cfg.bc.v, vp1 / (cfg.dt * Hz_v))
    up2, vp2, rf2, rv2 = uv3dmix2_geo(cfg, grid, LapU, LapV, zu, zv,
                                      Hz, z_r, z2, z2,
                                      visc3d_r=visc_r1)
    return (u_part - up2, v_part - vp2, rufrc - rf2, rvfrc - rv2)
