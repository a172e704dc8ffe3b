"""3D momentum right-hand side: Coriolis, curvilinear metric terms,
horizontal (UP3/C4/C2) and vertical (C4_SW default) advection, plus the
vertical integral that forces the barotropic mode.

Re-implements ROMS/Nonlinear/rhs3d.F:495-1830 (rhs3d_tile).  ru/rv arrive
initialized by the pressure gradient (roms_tpu.core.prsgrd); every term
adds.  Units m4/s2.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st

GADV = -0.25     # upstream-bias hyperdiffusion weight (rhs3d.F:329)


def _ring_x(cfg, *fs):
    if cfg.bc.ew_periodic:
        return tuple(st.periodic_x(f) for f in fs)
    return fs


def _ring_y(cfg, *fs):
    if cfg.bc.ns_periodic:
        return tuple(st.periodic_y(f) for f in fs)
    return fs


def coriolis(cfg: ModelConfig, grid: Grid, u, v, Hz):
    """rhs3d.F:502-527: energy-conserving Coriolis with Hz weighting."""
    cff = 0.5 * Hz * grid.fomn
    UFx = cff * (v + st.jp1(v))
    VFe = cff * (u + st.ip1(u))
    UFx, VFe = _ring_x(cfg, UFx, VFe)
    UFx, VFe = _ring_y(cfg, UFx, VFe)
    ru = 0.5 * (UFx + st.im1(UFx))
    rv = -0.5 * (VFe + st.jm1(VFe))
    return ru, rv


def curv_metric(cfg: ModelConfig, grid: Grid, u, v, Hz):
    """rhs3d.F:577-660: curvilinear transformation terms."""
    cff1 = 0.5 * (v + st.jp1(v))
    cff2 = 0.5 * (u + st.ip1(u))
    cff = Hz * (cff1 * grid.dndx - cff2 * grid.dmde)
    UFx = cff * cff1
    VFe = cff * cff2
    UFx, VFe = _ring_x(cfg, UFx, VFe)
    UFx, VFe = _ring_y(cfg, UFx, VFe)
    return 0.5 * (UFx + st.im1(UFx)), -0.5 * (VFe + st.jm1(VFe))


def _up3_upwind(cff1, curv_m, curv_p, flux2, hyper):
    """0.25*(cff1 + Gadv*curv_up)*(flux2 + Gadv*0.5*hyper)."""
    curv = jnp.where(cff1 > 0.0, curv_m, curv_p)
    return 0.25 * (cff1 + GADV * curv) * (flux2 + GADV * 0.5 * hyper)


def hadv_uv(cfg: ModelConfig, grid: Grid, u, v, Huon, Hvom):
    """Horizontal momentum advection, 3rd-order upstream bias (default)
    or centered (rhs3d.F:668-1010).  Returns (-div flux) contributions.
    """
    ewp = cfg.bc.ew_periodic
    nsp = cfg.bc.ns_periodic
    scheme = cfg.uv_hadv

    if scheme == "c2":
        UFx = 0.25 * (u + st.ip1(u)) * (Huon + st.ip1(Huon))
        UFe = 0.25 * (u + st.jm1(u)) * (Hvom + st.im1(Hvom))
        VFx = 0.25 * (v + st.im1(v)) * (Huon + st.jm1(Huon))
        VFe = 0.25 * (v + st.jp1(v)) * (Hvom + st.jp1(Hvom))
        UFx, VFe = _ring_x(cfg, UFx, VFe)
        UFx, VFe = _ring_y(cfg, UFx, VFe)
    else:   # up3 (reference default)
        uxx = st.lap_x(u)
        Huxx = st.lap_x(Huon)
        if ewp:
            uxx, Huxx = st.periodic_x(uxx), st.periodic_x(Huxx)
        else:
            # uxx(Istr)=uxx(Istr+1); uxx(Iend+1)=uxx(Iend) (rhs3d.F:732-746)
            uxx = st.clamp_east(st.clamp_west(uxx, col=2, at=1),
                                col=-2, at=-1)
            Huxx = st.clamp_east(st.clamp_west(Huxx, col=2, at=1),
                                 col=-2, at=-1)
        UFx = _up3_upwind(u + st.ip1(u),
                          uxx, st.ip1(uxx),
                          Huon + st.ip1(Huon),
                          Huxx + st.ip1(Huxx))
        UFx, = _ring_x(cfg, UFx)

        uee = st.lap_y(u)
        if nsp:
            uee = st.periodic_y(uee)
        else:
            uee = st.clamp_north(st.clamp_south(uee, row=1), row=-2)
        Hvxx = st.lap_x(Hvom)
        Hvxx, = _ring_x(cfg, Hvxx)
        cff2 = Hvom + st.im1(Hvom)
        curv = jnp.where(cff2 > 0.0, st.jm1(uee), uee)
        UFe = 0.25 * (u + st.jm1(u) + GADV * curv) * \
            (cff2 + GADV * 0.5 * (Hvxx + st.im1(Hvxx)))

        vxx = st.lap_x(v)
        if ewp:
            vxx = st.periodic_x(vxx)
        else:
            vxx = st.clamp_east(st.clamp_west(vxx, col=1, at=0),
                                col=-2, at=-1)
        Huee = st.lap_y(Huon)
        Huee, = _ring_y(cfg, Huee)
        cff2 = Huon + st.jm1(Huon)
        curv = jnp.where(cff2 > 0.0, st.im1(vxx), vxx)
        VFx = 0.25 * (v + st.im1(v) + GADV * curv) * \
            (cff2 + GADV * 0.5 * (Huee + st.jm1(Huee)))

        vee = st.lap_y(v)
        Hvee = st.lap_y(Hvom)
        if nsp:
            vee, Hvee = st.periodic_y(vee), st.periodic_y(Hvee)
        else:
            vee = st.clamp_north(st.clamp_south(vee, row=2, at=1),
                                 row=-2)
            Hvee = st.clamp_north(st.clamp_south(Hvee, row=2, at=1),
                                  row=-2)
        VFe = _up3_upwind(v + st.jp1(v),
                          vee, st.jp1(vee),
                          Hvom + st.jp1(Hvom),
                          Hvee + st.jp1(Hvee))
        VFe, = _ring_y(cfg, VFe)

    ru = -(UFx - st.im1(UFx)) - (st.jp1(UFe) - UFe)
    rv = -(st.ip1(VFx) - VFx) - (VFe - st.jm1(VFe))
    return ru, rv


def vadv_uv(cfg: ModelConfig, u, v, W):
    """Vertical momentum advection, default 4th-order with 4th-order W
    averaging (rhs3d.F:1133-1168 '#else' branch).  W: (N+1, Mj, Li).
    Returns the -dFC/dk contributions."""
    c1, c2 = 9.0 / 16.0, 1.0 / 16.0
    N = u.shape[0]

    if cfg.bc.ew_periodic:
        W = st.periodic_x(W)
    if cfg.bc.ns_periodic:
        W = st.periodic_y(W)

    # wide horizontal averages of W at U and V points.  The reach-2
    # arm must re-wrap the intermediate shift on a periodic axis: the
    # 1-point ghost ring has period Lm+2, not Lm, so a composite
    # roll-by-2 lands on the wrong column at the seam (same staged
    # re-wrap discipline as the UP3 curvature arrays above).
    Wm = st.im1(W)
    if cfg.bc.ew_periodic:
        Wm = st.periodic_x(Wm)
    Wjm = st.jm1(W)
    if cfg.bc.ns_periodic:
        Wjm = st.periodic_y(Wjm)
    Wu = c1 * (W + Wm) - c2 * (st.ip1(W) + st.im1(Wm))
    Wv = c1 * (W + Wjm) - c2 * (st.jp1(W) + st.jm1(Wjm))

    def flux(q, Wq):
        # interior interfaces k=2..N-2 (1-based)
        Fi = (c1 * (q[1:-2] + q[2:-1]) - c2 * (q[:-3] + q[3:])) * Wq[2:-2]
        F1 = (c1 * (q[0] + q[1]) - c2 * (q[0] + q[2])) * Wq[1]
        Fn = (c1 * (q[-2] + q[-1]) - c2 * (q[-3] + q[-1])) * Wq[N - 1]
        zeros = jnp.zeros_like(q[:1])
        return jnp.concatenate([zeros, F1[None], Fi, Fn[None], zeros],
                               axis=0)

    FCu = flux(u, Wu)
    FCv = flux(v, Wv)
    return -(FCu[1:] - FCu[:-1]), -(FCv[1:] - FCv[:-1])


def rhs3d_momentum(cfg: ModelConfig, grid: Grid, u, v, Hz, Huon, Hvom, W,
                   ru, rv):
    """Add Coriolis + metric + advection to (ru, rv) from the pressure
    gradient; mirrors rhs3d_tile's K_LOOP + J_LOOP."""
    if _use_pallas_rhs3d(cfg):
        import os

        from ..ops import pallas_rhs3d
        interp = os.environ.get(
            "ROMS_TPU_PALLAS_RHS3D_INTERPRET", "") == "1"
        return pallas_rhs3d.rhs3d_momentum_pallas(
            cfg, grid, u, v, Hz, Huon, Hvom, W, ru, rv,
            interpret=interp)
    if cfg.uv_cor:
        dru, drv = coriolis(cfg, grid, u, v, Hz)
        ru, rv = ru + dru, rv + drv
    if cfg.curvgrid and cfg.uv_adv:
        dru, drv = curv_metric(cfg, grid, u, v, Hz)
        ru, rv = ru + dru, rv + drv
    if cfg.uv_adv:
        dru, drv = hadv_uv(cfg, grid, u, v, Huon, Hvom)
        ru, rv = ru + dru, rv + drv
        dru, drv = vadv_uv(cfg, u, v, W)
        ru, rv = ru + dru, rv + drv
    return ru, rv


def _use_pallas_rhs3d(cfg: ModelConfig) -> bool:
    """Fused kernel covers the reference-default scheme set only:
    UP3 horizontal advection, C4_SW vertical, non-NS-periodic."""
    if cfg.bc.ns_periodic or cfg.uv_hadv != "up3":
        return False
    from ..ops import pallas_rhs3d
    return pallas_rhs3d.use_pallas_rhs3d(cfg)


def integrate_rufrc(cfg: ModelConfig, grid: Grid, ru, rv, forcing,
                    bustr, bvstr):
    """Vertical integral of the 3D RHS + stress difference -> 2D forcing
    (rhs3d.F:1697-1830)."""
    rufrc = jnp.sum(ru, axis=0) + \
        (forcing.sustr - bustr) * grid.om_u * grid.on_u
    rvfrc = jnp.sum(rv, axis=0) + \
        (forcing.svstr - bvstr) * grid.om_v * grid.on_v
    return rufrc, rvfrc
