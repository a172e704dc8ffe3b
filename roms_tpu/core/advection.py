"""Tracer advection flux schemes.

Shared by the predictor (pre_step3d.F:260-700) and corrector
(step3d_t.F:343-919, 922-1205) stages, which dispatch identically on the
per-tracer scheme flags (ROMS/Utility/tadv.F).  The reference's runtime
IF-dispatch becomes trace-time Python on the static config.

Implemented horizontal schemes: UPSTREAM3 (default), CENTERED4, AKIMA4,
CENTERED2, HSIMT (Wu & Zhu 2010 TVD).  Vertical: CENTERED4 (default),
SPLINES, AKIMA4, CENTERED2, HSIMT.  MPDATA (iterated antidiffusion)
lives in core.mpdata and is dispatched per-tracer by step3d_t.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import (ModelConfig, UPSTREAM3, CENTERED2, CENTERED4, AKIMA4,
                      SPLINES, HSIMT)
from ..grid.grid import Grid
from ..ops import stencil as st
from ..ops.tridiag import tridiag_solve

_EPS = 1.0e-16
_EPS1 = 1.0e-12          # HSIMT gradient threshold (step3d_t.F:293)
_CC1, _CC2, _CC3 = 0.25, 0.5, 1.0 / 12.0   # mod_scalars.F:393-395


def _hsimt_face(q_up, grad, grad_up, Ka, Ka_up, flux_sign):
    """One-sided HSIMT reconstruction at a face for one flow direction.

    q_up: upstream cell value; grad: face gradient; grad_up:
    next-upstream face gradient; Ka/Ka_up: 1-|CFL| factors.  Returns the
    limited face value q_up +- correction.
    """
    good = jnp.abs(grad) > _EPS1
    den = jnp.where(good, grad, 1.0)
    r = jnp.where(good, grad_up / den, 0.0)
    oKa = jnp.where(Ka > _EPS1, 1.0 / jnp.maximum(Ka, _EPS1), 0.0)
    rka = jnp.where(good, Ka_up * oKa, 0.0)
    a1 = _CC1 * Ka + _CC2 - _CC3 * oKa
    b1 = -_CC1 * Ka + _CC2 + _CC3 * oKa
    beta = a1 + b1 * r
    lim = 0.5 * jnp.maximum(
        0.0, jnp.minimum(jnp.minimum(2.0, 2.0 * r * rka), beta))         * grad * Ka
    return q_up + flux_sign * lim


def hadv_flux(cfg: ModelConfig, grid: Grid, q, Huon, Hvom, scheme: str):
    # SPLIT_U3 (step3d_t.F:635-700): the advective part of the split
    # third-order upstream scheme is identical to CENTERED4; its
    # diffusive (upwind) half is applied separately as an explicit
    # biharmonic term (tnu4), keeping the advection operator
    # self-adjoint for the TLM/ADM drivers.
    if scheme == "split_u3":
        scheme = CENTERED4
    """Horizontal advective fluxes (FX at U points, FE at V points).

    q: tracer (..., Mj, Li).  Mirrors pre_step3d.F:262-516 /
    step3d_t.F:343-860 for the C2/U3/C4/A4 schemes including the
    non-periodic edge clamps of the gradient scratch arrays.
    """
    ewp = cfg.bc.ew_periodic
    nsp = cfg.bc.ns_periodic

    if scheme == "upwind1":
        # first-order donor cell (pre_step3d.F:376-397, MPDATA/HSIMT
        # predictor fluxes)
        FX = jnp.maximum(Huon, 0.0) * st.im1(q) + \
            jnp.minimum(Huon, 0.0) * q
        FE = jnp.maximum(Hvom, 0.0) * st.jm1(q) + \
            jnp.minimum(Hvom, 0.0) * q
        return FX, FE
    if scheme == CENTERED2:
        FX = Huon * 0.5 * (q + st.im1(q))
        FE = Hvom * 0.5 * (q + st.jm1(q))
        return FX, FE

    # one-sided differences at U/V points, masked
    dqx = (q - st.im1(q)) * grid.umask
    dqe = (q - st.jm1(q)) * grid.vmask

    if scheme == HSIMT:
        # Wu & Zhu (2010) TVD (step3d_t.F:480-640).  The caller supplies
        # oHz via grid-time factors folded into the Courant number.
        dt = cfg.dt
        # NOTE: Ka needs layer thicknesses; hadv_flux has Hz implicit in
        # Huon.  The Courant factor uses the reference's
        # 0.125*(pm+pm)(pn+pn)*(oHz+oHz): approximate oHz with
        # Huon/(u*...)-free form by passing Hz through `grid`-independent
        # scaling is not possible here, so hadv_flux_hsimt is used by
        # callers with Hz in hand; dispatch happens in hadv_flux_hz.
        raise ValueError("HSIMT horizontal advection requires "
                         "hadv_flux_hz(..., Hz=...)")

    if scheme == UPSTREAM3:
        curvx = st.ip1(dqx) - dqx            # at rho cols
        curve = st.jp1(dqe) - dqe
        if ewp:
            curvx = st.periodic_x(curvx)
        else:
            curvx = st.zero_east(st.zero_west(curvx))
        if nsp:
            curve = st.periodic_y(curve)
        else:
            curve = st.zero_north(st.zero_south(curve))
        sixth = 1.0 / 6.0
        FX = Huon * 0.5 * (q + st.im1(q)) - sixth * (
            st.im1(curvx) * jnp.maximum(Huon, 0.0)
            + curvx * jnp.minimum(Huon, 0.0))
        FE = Hvom * 0.5 * (q + st.jm1(q)) - sixth * (
            st.jm1(curve) * jnp.maximum(Hvom, 0.0)
            + curve * jnp.minimum(Hvom, 0.0))
        return FX, FE

    if scheme == AKIMA4:
        def _harm(a, b):
            good = 2.0 * a * b > _EPS
            den = jnp.where(good, a + b, 1.0)
            return jnp.where(good, 2.0 * a * b / den, 0.0)
        gx = _harm(st.ip1(dqx), dqx)
        ge = _harm(st.jp1(dqe), dqe)
    elif scheme == CENTERED4:
        gx = 0.5 * (st.ip1(dqx) + dqx)
        ge = 0.5 * (st.jp1(dqe) + dqe)
    else:
        raise ValueError(f"unknown horizontal advection scheme {scheme}")

    if ewp:
        gx = st.periodic_x(gx)
    else:
        # clamp effect of FX(Istr-1)=FX(Istr) / FX(Iend+2)=FX(Iend+1)
        if scheme == CENTERED4:
            gx = st.clamp_west(gx, col=1, at=0, src=dqx)
            gx = st.clamp_east(gx, col=-1, at=-1, src=dqx)
        else:
            gx = st.zero_east(st.zero_west(gx))
    if nsp:
        ge = st.periodic_y(ge)
    else:
        if scheme == CENTERED4:
            ge = st.clamp_south(ge, row=1, src=dqe)
            ge = st.clamp_north(ge, row=-1, src=dqe)
        else:
            ge = st.zero_north(st.zero_south(ge))

    third = 1.0 / 3.0
    FX = Huon * 0.5 * (q + st.im1(q) - third * (gx - st.im1(gx)))
    FE = Hvom * 0.5 * (q + st.jm1(q) - third * (ge - st.jm1(ge)))
    return FX, FE


def vadv_flux(cfg: ModelConfig, q, W, Hz, scheme: str):
    if scheme == "split_u3":     # step3d_t.F:1144-1165
        scheme = CENTERED4
    """Vertical advective flux FC at interfaces (N+1, Mj, Li); FC[0]=FC[N]=0.

    q, Hz: (N, ...); W: (N+1, ...) interface omega mass flux.
    pre_step3d.F:520-650 / step3d_t.F:934-1205.
    """
    N = q.shape[0]
    zeros = jnp.zeros_like(q[:1])

    if scheme == "upwind1":
        # first-order upwind vertical flux (pre_step3d.F:745-760)
        Wi = W[1:-1]
        FCi = jnp.maximum(Wi, 0.0) * q[:-1] + jnp.minimum(Wi, 0.0) * q[1:]
        z = jnp.zeros_like(FCi[:1])
        return jnp.concatenate([z, FCi, z], axis=0)
    if scheme == CENTERED2:
        FCi = W[1:-1] * 0.5 * (q[:-1] + q[1:])
        return jnp.concatenate([zeros, FCi, zeros], axis=0)

    if scheme == CENTERED4:
        # interior k=2..N-2 (1-based): 7/12 centered minus 1/12 wide
        cff1, cff2, cff3 = 0.5, 7.0 / 12.0, 1.0 / 12.0
        FCi = W[2:-2] * (cff2 * (q[1:-2] + q[2:-1])
                         - cff3 * (q[:-3] + q[3:]))
        FC1 = W[1] * (cff1 * q[0] + cff2 * q[1] - cff3 * q[2])
        FCn = W[N - 1] * (cff1 * q[-1] + cff2 * q[-2] - cff3 * q[-3])
        return jnp.concatenate([zeros, FC1[None], FCi, FCn[None], zeros],
                               axis=0)

    if scheme == AKIMA4:
        dq = q[1:] - q[:-1]                       # (N-1,...)
        dq = jnp.concatenate([dq[:1], dq, dq[-1:]], axis=0)   # (N+1,...)
        _g = 2.0 * dq[1:] * dq[:-1] > _EPS
        _d = jnp.where(_g, dq[1:] + dq[:-1], 1.0)
        CFk = jnp.where(_g, 2.0 * dq[1:] * dq[:-1] / _d, 0.0)
        third = 1.0 / 3.0
        FCi = W[1:-1] * 0.5 * (q[:-1] + q[1:]
                               - third * (CFk[1:] - CFk[:-1]))
        return jnp.concatenate([zeros, FCi, zeros], axis=0)

    if scheme == SPLINES:
        # Conservative parabolic spline reconstruction of interface values
        # (pre_step3d.F:520-560), solved as a batched tridiagonal along k.
        # System for interface values s[k], k=0..N with low-order BCs
        # (non-NEUMANN branch): s0 + (coupling) handled by the reference's
        # specialized sweep; here assembled explicitly:
        #   k=0:      1*s0 + 1*s1            = 2 q1
        #   0<k<N:    Hz[k+1] s[k-1] + 2(Hz[k]+Hz[k+1]) s[k]
        #             + Hz[k] s[k+1]          = 3(Hz[k] q[k+1] + Hz[k+1] q[k])
        #             (reference indexing; here 0-based layers)
        #   k=N:      1*s[N-1] + 1*s[N]      = 2 qN
        ones = jnp.ones_like(q[:1])
        lower = jnp.concatenate([jnp.zeros_like(ones), Hz[1:], ones], axis=0)
        diag = jnp.concatenate([ones, 2.0 * (Hz[:-1] + Hz[1:]), ones], axis=0)
        upper = jnp.concatenate([ones, Hz[:-1], jnp.zeros_like(ones)], axis=0)
        rhs = jnp.concatenate([2.0 * q[:1],
                               3.0 * (Hz[:-1] * q[1:] + Hz[1:] * q[:-1]),
                               2.0 * q[-1:]], axis=0)
        s = tridiag_solve(lower, diag, upper, rhs)     # (N+1,...)
        FC = W * s
        FC = FC.at[0].set(0.0).at[-1].set(0.0)
        return FC

    raise ValueError(f"unknown vertical advection scheme {scheme}")


def hadv_flux_hsimt(cfg: ModelConfig, grid: Grid, q, Huon, Hvom, Hz):
    """HSIMT horizontal fluxes (step3d_t.F:480-640)."""
    dt = cfg.dt
    ewp = cfg.bc.ew_periodic
    nsp = cfg.bc.ns_periodic
    oHz = 1.0 / Hz

    def one_dir(qv, Hq, pm, pn, im1f, ip1f, periodic, perf, mask):
        cffc = 0.125 * (pm + im1f(pm)) * (pn + im1f(pn)) * dt
        grad = (qv - im1f(qv)) * mask
        Ka = (1.0 - jnp.abs(Hq * cffc * (oHz + im1f(oHz)))) * mask
        if periodic:
            grad = perf(grad)
            Ka = perf(Ka)
        else:
            # inflow-boundary upstream values vanish
            if im1f is st.im1:
                grad = grad.at[..., 0].set(0.0)
                Ka = Ka.at[..., 0].set(0.0)
            else:
                grad = st.zero_south(grad)
                Ka = st.zero_south(Ka)
        gm1, gp1 = im1f(grad), ip1f(grad)
        Km1, Kp1 = im1f(Ka), ip1f(Ka)
        if not periodic:
            if im1f is st.im1:
                gp1 = gp1.at[..., -1].set(0.0)
                Kp1 = Kp1.at[..., -1].set(0.0)
            else:
                gp1 = st.zero_north(gp1)
                Kp1 = st.zero_north(Kp1)
        sw_pos = _hsimt_face(im1f(qv), grad, gm1, Ka, Km1, +1.0)
        sw_neg = _hsimt_face(qv, grad, gp1, Ka, Kp1, -1.0)
        sw = jnp.where(Hq >= 0.0, sw_pos, sw_neg)
        return sw * Hq

    FX = one_dir(q, Huon, grid.pm, grid.pn, st.im1, st.ip1, ewp,
                 st.periodic_x, grid.umask)
    FE = one_dir(q, Hvom, grid.pn, grid.pm, st.jm1, st.jp1, nsp,
                 st.periodic_y, grid.vmask)
    return FX, FE


def vadv_flux_hsimt(cfg: ModelConfig, grid: Grid, q, W, z_r):
    """HSIMT vertical flux at interfaces (step3d_t.F:1060-1150)."""
    N = q.shape[0]
    pmn = (grid.pm * grid.pn)[None]
    Wi = W[1:-1]                               # interior interfaces
    Ka_i = 1.0 - jnp.abs(cfg.dt * pmn * Wi / (z_r[1:] - z_r[:-1]))
    grad_i = q[1:] - q[:-1]                    # (N-1,...)
    zpad = jnp.zeros_like(grad_i[:1])
    Ka = jnp.concatenate([zpad, Ka_i, zpad], axis=0)     # (N+1,...)
    grad = jnp.concatenate([zpad, grad_i, zpad], axis=0)

    sw_pos = _hsimt_face(q[:N - 1], grad[1:N], grad[0:N - 1],
                         Ka[1:N], Ka[0:N - 1], +1.0)
    sw_neg = _hsimt_face(q[1:N], grad[1:N], grad[2:N + 1],
                         Ka[1:N], Ka[2:N + 1], -1.0)
    sw = jnp.where(Wi >= 0.0, sw_pos, sw_neg)
    # first-order at the boundary-adjacent interfaces per flow direction
    kidx = jnp.arange(1, N)[:, None, None]
    sw = jnp.where((kidx == 1) & (Wi >= 0.0), q[0], sw)
    sw = jnp.where((kidx == N - 1) & (Wi < 0.0), q[N - 1], sw)
    FC = Wi * sw
    return jnp.concatenate([zpad, FC, zpad], axis=0)
