"""2D-only (shallow-water) time stepping — the main2d of the TPU core.

For barotropic applications (SOLITON, wetting-drying tests), each model
step is one LF-AM3 predictor/corrector pair with dtfast == dt
(roms_soliton.in NDTFAST == 1) and no SOLVE3D coupling: surface and
bottom stresses enter the 2D RHS directly (the #ifndef SOLVE3D branches
of step2d_LF_AM3.h:2180-2290, 2453-2470) and there is no fast-time
averaging.  The leap-frog history is carried ACROSS model steps, so the
whole run is one lax.scan over a persistent FastCarry-like state.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st
from . import step2d as s2d, wetdry as wd


class State2D(NamedTuple):
    time: jnp.ndarray
    iic: jnp.ndarray
    zeta: jnp.ndarray
    zeta_prev: jnp.ndarray
    ubar: jnp.ndarray
    ubar_prev: jnp.ndarray
    vbar: jnp.ndarray
    vbar_prev: jnp.ndarray
    rzeta_prev: jnp.ndarray
    rubar_prev: jnp.ndarray
    rvbar_prev: jnp.ndarray


def initial_state2d(cfg: ModelConfig, zeta=None, ubar=None, vbar=None,
                    time0: float = 0.0) -> State2D:
    dtype = jnp.dtype(cfg.dtype)
    shp = cfg.shape2d
    z = jnp.zeros(shp, dtype) if zeta is None else jnp.asarray(zeta, dtype)
    u = jnp.zeros(shp, dtype) if ubar is None else jnp.asarray(ubar, dtype)
    v = jnp.zeros(shp, dtype) if vbar is None else jnp.asarray(vbar, dtype)
    zz = jnp.zeros(shp, dtype)
    return State2D(time=jnp.asarray(time0, dtype),
                   iic=jnp.asarray(0, jnp.int32),
                   zeta=z, zeta_prev=z, ubar=u, ubar_prev=u,
                   vbar=v, vbar_prev=v,
                   rzeta_prev=zz, rubar_prev=zz, rvbar_prev=zz)


class Model2D:
    """Shallow-water model driver (main2d.F equivalent)."""

    def __init__(self, cfg: ModelConfig, grid: Grid,
                 forcing_fn: Optional[Callable] = None,
                 var_rho: bool = False):
        self.cfg = cfg
        self.grid = grid
        self.forcing_fn = forcing_fn
        self.var_rho = var_rho

    def _drag(self, ubar, vbar):
        """2D bottom stress from the barotropic velocity (set_vbc.F
        2D-configuration branch)."""
        d = self.cfg.drag
        if d.kind == "linear":
            return d.rdrg * ubar, d.rdrg * vbar
        if d.kind == "quadratic":
            v_at_u = 0.25 * (vbar + st.jp1(vbar) + st.im1(vbar)
                             + st.im1(st.jp1(vbar)))
            u_at_v = 0.25 * (ubar + st.ip1(ubar) + st.jm1(ubar)
                             + st.jm1(st.ip1(ubar)))
            bustr = d.rdrg2 * ubar * jnp.sqrt(ubar ** 2 + v_at_u ** 2)
            bvstr = d.rdrg2 * vbar * jnp.sqrt(vbar ** 2 + u_at_v ** 2)
            return bustr, bvstr
        z = jnp.zeros_like(ubar)
        return z, z

    def step_impl(self, s: State2D, grid: Grid) -> State2D:
        cfg = self.cfg
        dtfast = cfg.dt / cfg.ndtfast
        pmn = grid.pm * grid.pn
        pmn4_u = (grid.pm + st.im1(grid.pm)) * (grid.pn + st.im1(grid.pn))
        pmn4_v = (grid.pm + st.jm1(grid.pm)) * (grid.pn + st.jm1(grid.pn))
        first = (s.iic == 0)
        none = jnp.zeros_like(s.zeta)

        if self.forcing_fn is not None:
            forcing = self.forcing_fn(s.time)
            sustr, svstr = forcing.sustr, forcing.svstr
        else:
            sustr = svstr = none

        def stress_rhs(ubar, vbar):
            bustr, bvstr = self._drag(ubar, vbar)
            su = (sustr - bustr) * grid.om_u * grid.on_u
            sv = (svstr - bvstr) * grid.om_v * grid.on_v
            return su, sv

        # ---------------- predictor (FE first / LF) ----------------------
        Drhs, DUon, DVom = s2d._flux_state(cfg, grid, s.zeta, s.ubar,
                                           s.vbar)
        rhs_zeta = (DUon - st.ip1(DUon)) + (DVom - st.jp1(DVom))
        zeta_fe = s.zeta + pmn * dtfast * rhs_zeta
        zeta_lf = s.zeta_prev + pmn * (2.0 * dtfast) * rhs_zeta
        zeta_p = jnp.where(first, zeta_fe, zeta_lf) * grid.rmask
        if cfg.wetdry:
            zeta_p = wd.clamp_dry_zeta(cfg, grid, zeta_p)
            wm = wd.compute_wet_masks(cfg, grid, s.zeta)
        cff4, cff5 = 4.0 / 25.0, 1.0 - 8.0 / 25.0
        zwrk = jnp.where(first, 0.5 * (s.zeta + zeta_fe),
                         cff5 * s.zeta + cff4 * (s.zeta_prev + zeta_lf))
        gz, gz2, gzSA = s2d._gzeta(cfg, None, None, zwrk, self.var_rho)
        zeta_p = s2d._zeta_bc(cfg, zeta_p)
        Dnew = zeta_p + grid.h

        rhs_u, rhs_v = s2d._rhs2d_momentum(cfg, grid, s.ubar, s.vbar,
                                           Drhs, DUon, DVom, gz, gz2,
                                           gzSA, zwrk, None, self.var_rho)
        su, sv = stress_rhs(s.ubar, s.vbar)
        rhs_u, rhs_v = rhs_u + su, rhs_v + sv

        Dstp = jnp.where(first, s.zeta, s.zeta_prev) + grid.h
        cffdt = jnp.where(first, 0.5 * dtfast, dtfast)
        ub_base = jnp.where(first, s.ubar, s.ubar_prev)
        vb_base = jnp.where(first, s.vbar, s.vbar_prev)
        ubar_p = (ub_base * (Dstp + st.im1(Dstp))
                  + pmn4_u * cffdt * rhs_u) / (Dnew + st.im1(Dnew))
        vbar_p = (vb_base * (Dstp + st.jm1(Dstp))
                  + pmn4_v * cffdt * rhs_v) / (Dnew + st.jm1(Dnew))
        if cfg.wetdry:
            ubar_p = wd.mask_momentum(ubar_p, wm.umask_wet)
            vbar_p = wd.mask_momentum(vbar_p, wm.vmask_wet)
        ubar_p, vbar_p = s2d._uv_bc(cfg, grid, ubar_p * grid.umask,
                                    vbar_p * grid.vmask)
        rz_m, ru_m, rv_m = rhs_zeta, rhs_u, rhs_v

        # ---------------- corrector (BE first / AM3) ----------------------
        Drhs, DUon, DVom = s2d._flux_state(cfg, grid, zeta_p, ubar_p,
                                           vbar_p)
        div = (DUon - st.ip1(DUon)) + (DVom - st.jp1(DVom))
        zeta_be = s.zeta + pmn * dtfast * div
        zeta_am3 = s.zeta + pmn * ((5.0 / 12.0) * dtfast * div
                                   + (8.0 / 12.0) * dtfast * rz_m
                                   - (1.0 / 12.0) * dtfast * s.rzeta_prev)
        zeta_n = jnp.where(first, zeta_be, zeta_am3) * grid.rmask
        if cfg.wetdry:
            zeta_n = wd.clamp_dry_zeta(cfg, grid, zeta_n)
            wm = wd.compute_wet_masks(cfg, grid, zeta_p)
        cff4, cff5 = 2.0 / 5.0, 3.0 / 5.0
        zwrk = jnp.where(first, 0.5 * (s.zeta + zeta_be),
                         cff5 * zeta_am3 + cff4 * zeta_p)
        gz, gz2, gzSA = s2d._gzeta(cfg, None, None, zwrk, self.var_rho)
        zeta_n = s2d._zeta_bc(cfg, zeta_n)
        Dnew = zeta_n + grid.h

        rhs_u, rhs_v = s2d._rhs2d_momentum(cfg, grid, ubar_p, vbar_p,
                                           Drhs, DUon, DVom, gz, gz2,
                                           gzSA, zwrk, None, self.var_rho)
        su, sv = stress_rhs(ubar_p, vbar_p)
        rhs_u, rhs_v = rhs_u + su, rhs_v + sv

        Dstp = s.zeta + grid.h
        half = 0.5 * dtfast
        rhs_u_t = jnp.where(first, half * rhs_u,
                            half * ((5.0 / 12.0) * rhs_u
                                    + (8.0 / 12.0) * ru_m
                                    - (1.0 / 12.0) * s.rubar_prev))
        rhs_v_t = jnp.where(first, half * rhs_v,
                            half * ((5.0 / 12.0) * rhs_v
                                    + (8.0 / 12.0) * rv_m
                                    - (1.0 / 12.0) * s.rvbar_prev))
        ubar_n = (s.ubar * (Dstp + st.im1(Dstp)) + pmn4_u * rhs_u_t) / \
            (Dnew + st.im1(Dnew))
        vbar_n = (s.vbar * (Dstp + st.jm1(Dstp)) + pmn4_v * rhs_v_t) / \
            (Dnew + st.jm1(Dnew))
        if cfg.wetdry:
            ubar_n = wd.mask_momentum(ubar_n, wm.umask_wet)
            vbar_n = wd.mask_momentum(vbar_n, wm.vmask_wet)
        ubar_n, vbar_n = s2d._uv_bc(cfg, grid, ubar_n * grid.umask,
                                    vbar_n * grid.vmask)

        return State2D(time=s.time + dtfast, iic=s.iic + 1,
                       zeta=zeta_n, zeta_prev=s.zeta,
                       ubar=ubar_n, ubar_prev=s.ubar,
                       vbar=vbar_n, vbar_prev=s.vbar,
                       rzeta_prev=rz_m, rubar_prev=ru_m,
                       rvbar_prev=rv_m)

    def run(self, s: State2D, nsteps: int) -> State2D:
        def scan_run(s0, g):
            def body(c, _):
                return self.step_impl(c, g), None
            return lax.scan(body, s0, None, length=nsteps)[0]
        return jax.jit(scan_run)(s, self.grid)
