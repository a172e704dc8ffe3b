"""Additional analytical test applications.

SOLITON   — nondimensional equatorial Rossby soliton (2D-only engine):
            ana_grid.h:353-361 (48x16x1 domain, g=1, beta=1),
            ana_initial.h:231-268, 384-406 (Boyd soliton).
SEAMOUNT  — steep isolated seamount, the pressure-gradient-error
            acid test: ana_grid.h:346-352, 1032-1039 (4500 m Gaussian
            over 5000 m depth), ana_initial.h:809-816 (exponential T,
            resting).
GRAV_ADJ  — lock-exchange gravitational adjustment:
            ana_grid.h:298-304 (64 km x 20 m flat channel),
            ana_initial.h:672-686 (5 C temperature front).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import (LBC, BoundaryConfig, BottomDragConfig, EOSConfig,
                      MixingConfig, ModelConfig, VerticalCoordConfig,
                      UPSTREAM3, CENTERED4)
from ..core.state import Forcing, State, initial_state
from ..grid.grid import Grid, build_grid


def _plane_grid(cfg, Xsize, Esize, depth, f0, beta=0.0, h2d=None):
    Mj, Li = cfg.shape2d
    dx = Xsize / cfg.Lm
    dy = Esize / cfg.Mm
    i = np.arange(Li, dtype=np.float64)
    j = np.arange(Mj, dtype=np.float64)
    xr = (dx * (i - 0.5))[None, :] + np.zeros((Mj, 1))
    yr = (dy * (j - 0.5))[:, None] + np.zeros((1, Li))
    pm = np.full((Mj, Li), 1.0 / dx)
    pn = np.full((Mj, Li), 1.0 / dy)
    f = f0 + beta * (yr - 0.5 * Esize)
    h = np.full((Mj, Li), depth) if h2d is None else h2d(xr, yr)
    return build_grid(cfg, h=h, pm=pm, pn=pn, f=np.broadcast_to(
        f, (Mj, Li)).copy(), xr=xr, yr=yr)


# ---------------------------------------------------------------------------
# SOLITON (2D only)
# ---------------------------------------------------------------------------

def soliton_config(Lm: int = 96, Mm: int = 32, dt: float = 0.05,
                   dtype: str = "float64") -> ModelConfig:
    lbc = LBC.ew_periodic()
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=1,
        vert=VerticalCoordConfig(N=1, Vstretching=1, theta_s=0.0,
                                 Tcline=1e16),
        mixing=MixingConfig(visc2=0.0),
        drag=BottomDragConfig(kind="none"),
        bc=BoundaryConfig.uniform(lbc),
        rho0=1.0, g=1.0, gamma2=1.0,
        uv_hadv="c4", uv_cor=True, uv_adv=True, curvgrid=False,
        dtype=dtype,
    )


def soliton_grid(cfg: ModelConfig) -> Grid:
    return _plane_grid(cfg, 48.0, 16.0, 1.0, f0=0.0, beta=1.0)


def soliton_initial(cfg: ModelConfig, grid: Grid):
    """Boyd (1980) first-order soliton (ana_initial.h:231-268,384-406)."""
    from ..core.main2d import initial_state2d
    Mj, Li = cfg.shape2d
    dx = 48.0 / cfg.Lm
    dy = 16.0 / cfg.Mm
    i = np.arange(Li, dtype=np.float64)
    j = np.arange(Mj, dtype=np.float64)
    xr = (dx * (i - 0.5))[None, :] + np.zeros((Mj, 1))
    yr = (dy * (j - 0.5))[:, None] + np.zeros((1, Li))
    x0, y0 = 2.0 * 48.0 / 3.0, 0.5 * 16.0
    B, A = 0.395, 0.771 * 0.395 ** 2

    def sech2(x):
        e = np.exp(-B * x)
        return A * (2.0 * e / (1.0 + e * e)) ** 2

    x = xr - x0
    y = yr - y0
    zeta = 0.25 * sech2(x) * (6.0 * y * y + 3.0) * np.exp(-0.5 * y * y)
    xu = x - 0.5 * dx
    ubar = 0.25 * sech2(xu) * (6.0 * y * y - 9.0) * np.exp(-0.5 * y * y)
    yv = y - 0.5 * dy
    vbar = 2.0 * sech2(x) * yv * (-2.0 * B * np.tanh(B * x)) * \
        np.exp(-0.5 * yv * yv)
    return initial_state2d(cfg, zeta=zeta, ubar=ubar, vbar=vbar)


# ---------------------------------------------------------------------------
# SEAMOUNT
# ---------------------------------------------------------------------------

def seamount_config(Lm: int = 49, Mm: int = 48, N: int = 13,
                    dt: float = 60.0, ndtfast: int = 20,
                    dtype: str = "float64") -> ModelConfig:
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=1, Vstretching=1,
                                 theta_s=5.0, theta_b=0.4, Tcline=50.0),
        eos=EOSConfig(linear=True, R0=1027.0, T0=5.0, S0=35.0,
                      Tcoef=1.0e-4, Scoef=0.0),
        mixing=MixingConfig(visc2=100.0, tnu2=(100.0, 100.0),
                            akv_bak=1.0e-5, akt_bak=(1.0e-6, 1.0e-6)),
        drag=BottomDragConfig(kind="linear", rdrg=3.0e-4),
        bc=BoundaryConfig(),           # closed basin
        rho0=1025.0, gamma2=1.0,
        hadv=UPSTREAM3, vadv=CENTERED4,
        uv_hadv="up3", uv_vadv="c4_sw",
        uv_cor=False, uv_adv=True, curvgrid=False,
        dtype=dtype,
    )


def seamount_grid(cfg: ModelConfig) -> Grid:
    def h2d(xr, yr):
        v1 = (xr - 0.5 * 320.0e3) / 40.0e3
        v2 = (yr - 0.5 * 320.0e3) / 40.0e3
        return 5000.0 - 4500.0 * np.exp(-(v1 * v1 + v2 * v2))
    return _plane_grid(cfg, 320.0e3, 320.0e3, 5000.0, f0=0.0, h2d=h2d)


def seamount_initial(cfg: ModelConfig, grid: Grid) -> State:
    from ..grid.depth import set_depth
    zeta = jnp.zeros(cfg.shape2d, cfg.dtype)
    z_r, _, _ = set_depth(grid, zeta)
    T = cfg.eos.T0 + 7.5 * jnp.exp(z_r / 1000.0)
    S = jnp.full_like(T, cfg.eos.S0)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


# ---------------------------------------------------------------------------
# GRAV_ADJ
# ---------------------------------------------------------------------------

def grav_adj_config(Lm: int = 128, Mm: int = 4, N: int = 40,
                    dt: float = 10.0, ndtfast: int = 20,
                    dtype: str = "float64") -> ModelConfig:
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=1, Vstretching=1,
                                 theta_s=0.0, theta_b=0.0, Tcline=1e16),
        eos=EOSConfig(linear=True, R0=1027.0, T0=10.0, S0=35.0,
                      Tcoef=1.7e-4, Scoef=0.0),
        mixing=MixingConfig(visc2=10.0, tnu2=(5.0, 5.0),
                            akv_bak=1.0e-5, akt_bak=(1.0e-6, 1.0e-6)),
        drag=BottomDragConfig(kind="none"),
        bc=BoundaryConfig(),           # closed channel
        rho0=1025.0, gamma2=1.0,
        hadv=UPSTREAM3, vadv=CENTERED4,
        uv_hadv="up3", uv_vadv="c4_sw",
        uv_cor=False, uv_adv=True, curvgrid=False,
        dtype=dtype,
    )


def grav_adj_grid(cfg: ModelConfig) -> Grid:
    Esize = cfg.Mm * 64.0e3 / cfg.Lm
    return _plane_grid(cfg, 64.0e3, Esize, 20.0, f0=0.0)


def grav_adj_initial(cfg: ModelConfig, grid: Grid) -> State:
    Mj, Li = cfg.shape2d
    icol = np.arange(Li)
    # reference: T0+5 for i <= (Lm+1)/2, T0 beyond (ana_initial.h:672-686)
    Tcold = np.where(icol <= (cfg.Lm + 1) // 2, cfg.eos.T0 + 5.0,
                     cfg.eos.T0)
    T = jnp.asarray(np.broadcast_to(Tcold[None, None, :],
                                    (cfg.N, Mj, Li)).copy(), cfg.dtype)
    S = jnp.full_like(T, cfg.eos.S0)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


def zero_forcing(cfg: ModelConfig):
    Mj, Li = cfg.shape2d
    dtype = jnp.dtype(cfg.dtype)
    zeros = jnp.zeros((Mj, Li), dtype)
    zerosT = jnp.zeros((cfg.NT, Mj, Li), dtype)

    def forcing(time):
        return Forcing(sustr=zeros, svstr=zeros, stflx=zerosT,
                       btflx=zerosT, srflx=zeros)

    return forcing


# ---------------------------------------------------------------------------
# BASIN — big flat closed basin, wind-driven double gyre spin-up
# (ana_grid.h:237-242, ana_initial.h:559-569, ana_smflux.h:141-152)
# ---------------------------------------------------------------------------

def basin_config(Lm: int = 60, Mm: int = 50, N: int = 10,
                 dt: float = 1800.0, ndtfast: int = 30,
                 dtype: str = "float64") -> ModelConfig:
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=1, Vstretching=1,
                                 theta_s=0.001, theta_b=0.0, Tcline=1e16),
        eos=EOSConfig(linear=True, R0=1028.0, T0=0.0, S0=35.0,
                      Tcoef=1.0e-4, Scoef=0.0),
        mixing=MixingConfig(visc2=1300.0, tnu2=(1300.0, 1300.0),
                            akv_bak=1.0e-5, akt_bak=(1.0e-6, 1.0e-6)),
        drag=BottomDragConfig(kind="linear", rdrg=3.0e-4),
        bc=BoundaryConfig(),
        rho0=1025.0, gamma2=1.0,
        hadv=UPSTREAM3, vadv=CENTERED4,
        uv_hadv="up3", uv_vadv="c4_sw",
        uv_cor=True, uv_adv=True, curvgrid=False,
        dtype=dtype,
    )


def basin_grid(cfg: ModelConfig) -> Grid:
    return _plane_grid(cfg, 3600.0e3, 2800.0e3, 5000.0, f0=1.0e-4,
                       beta=2.0e-11)


def basin_initial(cfg: ModelConfig, grid: Grid) -> State:
    from ..grid.depth import set_depth
    zeta = jnp.zeros(cfg.shape2d, cfg.dtype)
    z_r, _, _ = set_depth(grid, zeta)
    val1 = (44.69 / 39.382) ** 2
    val2 = val1 * (cfg.rho0 * 800.0 / 9.81) * \
        (5.0e-5 / ((42.689 / 44.69) ** 2))
    T = val2 * jnp.exp(z_r / 800.0) * (0.6 - 0.4 * jnp.tanh(z_r / 800.0))
    S = jnp.full_like(T, cfg.eos.S0)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


def basin_forcing_fn(cfg: ModelConfig, grid: Grid):
    """Ramped sinusoidal zonal wind (ana_smflux.h:141-152)."""
    import math
    Mj, Li = cfg.shape2d
    dtype = jnp.dtype(cfg.dtype)
    Esize = 2800.0e3
    dy = Esize / cfg.Mm
    yr = jnp.asarray((dy * (np.arange(Mj) - 0.5))[:, None]
                     + np.zeros((1, Li)), dtype)
    val2 = 2.0 * math.pi / Esize
    zeros = jnp.zeros((Mj, Li), dtype)
    zerosT = jnp.zeros((cfg.NT, Mj, Li), dtype)

    def forcing(time):
        val1 = 5.0e-5 * (1.0 + jnp.tanh((time - 6.0 * 86400.0)
                                        / (3.0 * 86400.0)))
        sustr = -val1 * jnp.cos(val2 * yr)
        return Forcing(sustr=sustr.astype(dtype), svstr=zeros,
                       stflx=zerosT, btflx=zerosT, srflx=zeros)

    return forcing


# ---------------------------------------------------------------------------
# DOUBLE_GYRE (ana_grid.h:273-278, ana_initial.h:631-645,
# ana_smflux.h:198-209)
# ---------------------------------------------------------------------------

def double_gyre_config(Lm: int = 50, Mm: int = 100, N: int = 10,
                       dt: float = 1800.0, ndtfast: int = 30,
                       dtype: str = "float64") -> ModelConfig:
    cfg = basin_config(Lm=Lm, Mm=Mm, N=N, dt=dt, ndtfast=ndtfast,
                       dtype=dtype)
    return cfg.replace(
        eos=EOSConfig(linear=True, R0=1027.0, T0=14.0, S0=34.5,
                      Tcoef=1.7e-4, Scoef=0.0),
        mixing=MixingConfig(visc2=800.0, tnu2=(800.0, 800.0),
                            akv_bak=1.0e-5, akt_bak=(1.0e-6, 1.0e-6)))


def double_gyre_grid(cfg: ModelConfig) -> Grid:
    return _plane_grid(cfg, 1000.0e3, 2000.0e3, 500.0, f0=7.3e-5,
                       beta=2.0e-11)


def double_gyre_initial(cfg: ModelConfig, grid: Grid) -> State:
    from ..grid.depth import set_depth
    zeta = jnp.zeros(cfg.shape2d, cfg.dtype)
    z_r, _, _ = set_depth(grid, zeta)
    Mj, Li = cfg.shape2d
    Esize = 2000.0e3
    dy = Esize / cfg.Mm
    yr = jnp.asarray((dy * (np.arange(Mj) - 0.5))[:, None]
                     + np.zeros((1, Li)), cfg.dtype)
    val1 = (44.69 / 39.382) ** 2
    val2 = val1 * (cfg.rho0 * 100.0 / 9.81) * \
        (5.0e-5 / ((42.689 / 44.69) ** 2))
    val4 = yr / Esize
    T = cfg.eos.T0 + val2 * jnp.exp(z_r / 100.0) * \
        (10.0 - 0.4 * jnp.tanh(z_r / 100.0)) - 3.0 * val4[None]
    S = 34.5 - 0.001 * z_r - val4[None]
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


def double_gyre_forcing_fn(cfg: ModelConfig, grid: Grid):
    """sustr = -(0.05/rho0) cos(2 pi y/L) (ana_smflux.h:198-209)."""
    import math
    Mj, Li = cfg.shape2d
    dtype = jnp.dtype(cfg.dtype)
    Esize = 2000.0e3
    dy = Esize / cfg.Mm
    yr = (dy * (np.arange(Mj) - 0.5))[:, None] + np.zeros((1, Li))
    sustr = jnp.asarray(-0.05 / cfg.rho0
                        * np.cos(2.0 * math.pi * yr / Esize), dtype)
    zeros = jnp.zeros((Mj, Li), dtype)
    zerosT = jnp.zeros((cfg.NT, Mj, Li), dtype)

    def forcing(time):
        return Forcing(sustr=sustr, svstr=zeros, stflx=zerosT,
                       btflx=zerosT, srflx=zeros)

    return forcing
