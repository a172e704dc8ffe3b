"""KELVIN analytical test — coastal Kelvin wave forced at the western
boundary, radiated through the eastern boundary.

The reference's open-boundary regression case (ROMS/Include/kelvin.h,
roms_kelvin.in): 50x30x10 channel, dx=dy=20 km, depth 100 m, f=1e-4;
west: Chapman-implicit zeta + Flather 2D momentum driven by an M2-period
Kelvin wave (ana_fsobc.h:85-110, ana_m2obc.h:169-195), east: radiation;
north/south walls.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import constants
from ..config import (LBC, BoundaryConfig, BottomDragConfig,
                      CHAPMAN_IMPLICIT, CLOSED, EOSConfig, FLATHER,
                      GRADIENT, MixingConfig, ModelConfig, RADIATION,
                      VerticalCoordConfig, UPSTREAM3, CENTERED4)
from ..core.state import Forcing, State, initial_state
from ..grid.grid import Grid, build_grid

F0 = 1.0e-4
DEPTH = 100.0
M2_OMEGA = 2.0 * math.pi / (12.42 * 3600.0)


def make_config(Lm: int = 50, Mm: int = 30, N: int = 10,
                dt: float = 900.0, ndtfast: int = 60,
                dtype: str = "float64") -> ModelConfig:
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=2, Vstretching=1,
                                 theta_s=0.0, theta_b=0.0, Tcline=1.0e16),
        eos=EOSConfig(linear=True, R0=1027.0, T0=10.0, S0=35.0,
                      Tcoef=1.7e-4, Scoef=0.0),
        mixing=MixingConfig(visc2=5.0, tnu2=(0.0, 0.0),
                            akv_bak=1.0e-5, akt_bak=(1.0e-6, 1.0e-6),
                            vmix="constant"),
        drag=BottomDragConfig(kind="quadratic", rdrg2=3.0e-3),
        bc=BoundaryConfig(
            zeta=LBC(west=CHAPMAN_IMPLICIT, east=RADIATION,
                     south=CLOSED, north=CLOSED),
            ubar=LBC(west=FLATHER, east=RADIATION,
                     south=CLOSED, north=CLOSED),
            vbar=LBC(west=FLATHER, east=RADIATION,
                     south=CLOSED, north=CLOSED),
            u=LBC(west=RADIATION, east=RADIATION,
                  south=CLOSED, north=CLOSED),
            v=LBC(west=RADIATION, east=RADIATION,
                  south=CLOSED, north=CLOSED),
            t=LBC(west=RADIATION, east=RADIATION,
                  south=CLOSED, north=CLOSED),
            tke=LBC(west=GRADIENT, east=GRADIENT,
                    south=CLOSED, north=CLOSED)),
        rho0=1025.0, gamma2=1.0,
        hadv=UPSTREAM3, vadv=CENTERED4,
        uv_hadv="up3", uv_vadv="c4_sw",
        uv_cor=True, uv_adv=True, curvgrid=False,
        dtype=dtype,
    )


def make_grid(cfg: ModelConfig) -> Grid:
    """ana_grid.h KELVIN: dx=dy=20 km, flat 100 m, f-plane."""
    Mj, Li = cfg.shape2d
    dx = 20000.0
    i = np.arange(Li, dtype=np.float64)
    j = np.arange(Mj, dtype=np.float64)
    xr = (dx * (i - 0.5))[None, :] + np.zeros((Mj, 1))
    yr = (dx * (j - 0.5))[:, None] + np.zeros((1, Li))
    pm = np.full((Mj, Li), 1.0 / dx)
    pn = np.full((Mj, Li), 1.0 / dx)
    f = np.full((Mj, Li), F0)
    h = np.full((Mj, Li), DEPTH)
    return build_grid(cfg, h=h, pm=pm, pn=pn, f=f, xr=xr, yr=yr)


def make_initial(cfg: ModelConfig, grid: Grid) -> State:
    T = jnp.full((cfg.N,) + cfg.shape2d, cfg.eos.T0, cfg.dtype)
    S = jnp.full_like(T, cfg.eos.S0)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


def make_forcing_fn(cfg: ModelConfig, grid: Grid):
    Mj, Li = cfg.shape2d
    dtype = jnp.dtype(cfg.dtype)
    zeros = jnp.zeros((Mj, Li), dtype)
    zerosT = jnp.zeros((cfg.NT, Mj, Li), dtype)

    def forcing(time):
        return Forcing(sustr=zeros, svstr=zeros, stflx=zerosT,
                       btflx=zerosT, srflx=zeros)

    return forcing


def make_obc_fn(cfg: ModelConfig, grid: Grid):
    """Kelvin-wave boundary data at the western edge (ana_fsobc.h:85-95,
    ana_m2obc.h:169-195): zeta0=1 m, M2 period, e-folding = Rossby
    radius sqrt(gH)/f."""
    g = constants.g
    Mj, Li = cfg.shape2d
    dx = 20000.0
    # PSI-point y at the western boundary (yp ~ dx*j)
    yp = jnp.asarray(dx * np.arange(Mj, dtype=np.float64), cfg.dtype)
    cph = math.sqrt(g * DEPTH)
    decay = jnp.exp(-F0 * yp / cph)

    def obc(time):
        zeta_w = decay * jnp.cos(M2_OMEGA * time)
        ubar_w = (jnp.sin(M2_OMEGA * time) * cph / DEPTH) * decay
        return {"zeta": {"west": zeta_w},
                "ubar": {"west": ubar_w}}

    return obc
