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


# ---------------------------------------------------------------------------
# CANYON — stratified flow over a coastal canyon in a periodic channel
# (canyon.h; ana_grid.h:261-266, 946-953; ana_initial.h:598-607)
# ---------------------------------------------------------------------------

def canyon_config(Lm: int = 65, Mm: int = 48, N: int = 15,
                  dt: float = 100.0, ndtfast: int = 20,
                  dtype: str = "float64") -> ModelConfig:
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=1, Vstretching=1,
                                 theta_s=3.5, theta_b=0.0, Tcline=50.0),
        eos=EOSConfig(linear=True, R0=1027.0, T0=14.0, S0=35.0,
                      Tcoef=1.0e-4, Scoef=0.0),
        mixing=MixingConfig(visc2=5.0, tnu2=(1.0, 1.0),
                            mix_geo_ts=True),
        drag=BottomDragConfig(kind="quadratic", rdrg2=3.0e-4),
        bc=BoundaryConfig.uniform(LBC.ew_periodic()),
        rho0=1025.0, gamma2=1.0, prsgrd="djs",
        uv_cor=True, uv_adv=True, dtype=dtype,
    )


def canyon_grid(cfg: ModelConfig) -> Grid:
    """h = 20 + (4000-20)/2 * (1 + tanh((y - yc(x))/10 km)), with the
    shelf break indented by the canyon sin^24 notch
    (ana_grid.h:946-953)."""
    Xsize, Esize, depth = 128.0e3, 96.0e3, 4000.0

    def h2d(xr, yr):
        val1 = 32000.0 - 16000.0 * np.sin(np.pi * xr / Xsize) ** 24
        return 20.0 + 0.5 * (depth - 20.0) * \
            (1.0 + np.tanh((yr - val1) / 10000.0))

    return _plane_grid(cfg, Xsize, Esize, depth, f0=1.0e-4, h2d=h2d)


def canyon_initial(cfg: ModelConfig, grid: Grid) -> State:
    from ..grid.depth import set_depth
    zeta = jnp.zeros(cfg.shape2d, cfg.dtype)
    z_r, _, _ = set_depth(grid, zeta)
    T = 3.488 * jnp.exp(z_r / 800.0) * \
        (1.0 - (2.0 / 3.0) * jnp.tanh(z_r / 800.0))
    S = jnp.full_like(T, cfg.eos.S0)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


# ---------------------------------------------------------------------------
# OVERFLOW — dense gravity current down a tanh slope (overflow.h;
# ana_grid.h:328-333, 1004-1011; ana_initial.h:778-786)
# ---------------------------------------------------------------------------

def overflow_config(Lm: int = 4, Mm: int = 128, N: int = 20,
                    dt: float = 20.0, ndtfast: int = 20,
                    dtype: str = "float64") -> ModelConfig:
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=1, Vstretching=1,
                                 theta_s=3.0, theta_b=1.0, Tcline=50.0),
        eos=EOSConfig(linear=True, R0=1030.0, T0=5.0, S0=0.0,
                      Tcoef=1.7e-4, Scoef=0.0),
        mixing=MixingConfig(visc2=5.0, tnu2=(5.0, 0.0),
                            mix_iso_ts=True, akv_bak=1.0e-6,
                            akt_bak=(1.0e-7, 1.0e-7)),
        drag=BottomDragConfig(kind="quadratic", rdrg2=0.0),
        bc=BoundaryConfig(),               # closed on all sides
        rho0=1025.0, gamma2=1.0, uv_cor=False, uv_adv=True,
        dtype=dtype,
    )


def overflow_grid(cfg: ModelConfig) -> Grid:
    def h2d(xr, yr):
        return 200.0 + 0.5 * (4000.0 - 200.0) * \
            (1.0 + np.tanh((yr - 100000.0) / 20000.0))

    return _plane_grid(cfg, 4.0e3, 200.0e3, 4000.0, f0=0.0, h2d=h2d)


def overflow_initial(cfg: ModelConfig, grid: Grid) -> State:
    Mj, Li = cfg.shape2d
    dy = 200.0e3 / cfg.Mm
    yr = jnp.asarray((dy * (np.arange(Mj) - 0.5))[:, None]
                     + np.zeros((1, Li)), cfg.dtype)
    T0 = cfg.eos.T0
    T2d = T0 - 0.5 * T0 * (1.0 + jnp.tanh((yr - 60000.0) / 2000.0))
    T = jnp.broadcast_to(T2d[None], (cfg.N, Mj, Li))
    S = jnp.full_like(T, cfg.eos.S0)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


# ---------------------------------------------------------------------------
# LAKE_SIGNELL — wind-driven closed lake with GLS mixing, SSW wave-current
# BBL and suspended sediment (lake_signell.h; ana_grid.h:310-315,
# 1000-1003; ana_smflux.h:219-231)
# ---------------------------------------------------------------------------

def lake_signell_config(Lm: int = 100, Mm: int = 20, N: int = 8,
                        dt: float = 60.0, ndtfast: int = 20,
                        dtype: str = "float64") -> ModelConfig:
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=1, Vstretching=1,
                                 theta_s=1.0, theta_b=1.0, Tcline=20.0),
        eos=EOSConfig(linear=True, R0=1027.0, T0=10.0, S0=30.0,
                      Tcoef=1.7e-4, Scoef=7.6e-4),
        mixing=MixingConfig(vmix="gls", akv_bak=5.0e-6,
                            akt_bak=(5.0e-6, 5.0e-6)),
        drag=BottomDragConfig(kind="log", Zob=0.005),
        bc=BoundaryConfig(),                   # closed basin
        rho0=1025.0, gamma2=1.0, dtype=dtype,
    )


def lake_signell_grid(cfg: ModelConfig) -> Grid:
    Mm = cfg.Mm

    def h2d(xr, yr):
        dy = 10.0e3 / Mm
        j = yr / dy + 0.5                       # recover the j index
        return 18.0 - 16.0 * (Mm - j) / (Mm - 1.0)

    return _plane_grid(cfg, 50.0e3, 10.0e3, 18.0, f0=0.0, h2d=h2d)


def lake_signell_initial(cfg: ModelConfig, grid: Grid) -> State:
    Mj, Li = cfg.shape2d
    T = jnp.full((cfg.N, Mj, Li), 10.0, cfg.dtype)
    S = jnp.full_like(T, 30.0)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


def lake_signell_forcing_fn(cfg: ModelConfig, grid: Grid):
    """0.25 N/m2 along-lake wind, tanh ramp up at hour 15 over 10 h and
    down at hour 50 (ana_smflux.h:219-231)."""
    Mj, Li = cfg.shape2d
    dtype = jnp.dtype(cfg.dtype)
    zeros = jnp.zeros((Mj, Li), dtype)
    zerosT = jnp.zeros((cfg.NT, Mj, Li), dtype)
    mxst, ramp_u, ramp_time, ramp_d = 0.25, 15.0, 10.0, 50.0

    def forcing(time):
        th = time / 3600.0
        up = 0.5 * (jnp.tanh((th - ramp_u) / (ramp_time / 5.0)) + 1.0)
        dn = 1.0 - 0.5 * (jnp.tanh((th - ramp_d)
                                   / (ramp_time / 5.0)) + 1.0)
        cff1 = jnp.minimum(up, dn)
        sustr = (mxst / cfg.rho0 * cff1) + zeros
        return Forcing(sustr=sustr.astype(dtype), svstr=zeros,
                       stflx=zerosT, btflx=zerosT, srflx=zeros)

    return forcing


# ---------------------------------------------------------------------------
# ESTUARY_TEST — tidal estuary with salinity intrusion and GLS mixing
# (estuary_test.h; ana_grid.h:280-285, 954-959; ana_initial.h:647-660;
# ana_fsobc.h:106-113; ana_m2obc.h:127-168)
# ---------------------------------------------------------------------------

def estuary_config(Lm: int = 200, Mm: int = 3, N: int = 20,
                   dt: float = 30.0, ndtfast: int = 20,
                   dtype: str = "float64") -> ModelConfig:
    from ..config import (CHAPMAN_IMPLICIT, CLAMPED, GRADIENT,
                          RADIATION)
    zeta = LBC(west=CHAPMAN_IMPLICIT, east=GRADIENT)
    uv2 = LBC(west=CLAMPED, east=CLAMPED)
    uv3 = LBC(west=GRADIENT, east=GRADIENT)
    trc = LBC(west=RADIATION, east=CLAMPED)
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=2, Vstretching=4,
                                 theta_s=2.0, theta_b=2.0, Tcline=3.0),
        eos=EOSConfig(linear=True, R0=1027.0, T0=10.0, S0=30.0,
                      Tcoef=1.7e-4, Scoef=7.6e-4),
        mixing=MixingConfig(vmix="gls", akv_bak=5.0e-6,
                            akt_bak=(5.0e-6, 5.0e-6)),
        drag=BottomDragConfig(kind="log", Zob=0.005),
        bc=BoundaryConfig(zeta=zeta, ubar=uv2, vbar=uv2,
                          u=uv3, v=uv3, t=trc, tke=uv3),
        rho0=1025.0, gamma2=1.0, uv_cor=False, dtype=dtype,
    )


def estuary_grid(cfg: ModelConfig) -> Grid:
    def h2d(xr, yr):
        return 5.0 + (100000.0 - xr) / 100000.0 * 5.0

    return _plane_grid(cfg, 100.0e3, 300.0, 10.0, f0=0.0, h2d=h2d)


def estuary_initial(cfg: ModelConfig, grid: Grid) -> State:
    Mj, Li = cfg.shape2d
    dx = 100.0e3 / cfg.Lm
    xr = jnp.asarray((dx * (np.arange(Li) - 0.5))[None, :]
                     + np.zeros((Mj, 1)), cfg.dtype)
    S2d = jnp.where(xr <= 30000.0, 30.0,
                    jnp.where(xr <= 80000.0,
                              (80000.0 - xr) / 50000.0 * 30.0, 0.0))
    T = jnp.full((cfg.N, Mj, Li), 10.0, cfg.dtype)
    S = jnp.broadcast_to(S2d[None], T.shape)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


def estuary_obc_fn(cfg: ModelConfig, grid: Grid):
    """M2 tide at the mouth: zeta_west = sin(2 pi t/12h); ubar_west
    carries the tidal + river volume flux through the (undisturbed)
    western section — the reference divides by the instantaneous area
    (ana_m2obc.h:136-148); the rest-area approximation here changes the
    flux by O(zeta/h).  Tracer data for the Cla east edge: river water
    (S=0)."""
    Mj = cfg.shape2d[0]
    h_w = np.asarray(grid.h)[:, 1]
    pn_w = np.asarray(grid.pn)[:, 1]
    area = float(np.sum(h_w[1:-1] / pn_w[1:-1]))
    tid_flow = 0.40 * 300.0 * 10.0
    riv_flow = 0.08 * 300.0 * 5.0
    zeros_col = jnp.zeros((Mj,), cfg.dtype)
    t_east = {0: {"east": jnp.full((cfg.N, Mj), 10.0, cfg.dtype)},
              1: {"east": jnp.zeros((cfg.N, Mj), cfg.dtype)}}

    def obc(time):
        zw = 1.0 * jnp.sin(2.0 * jnp.pi * time / (12.0 * 3600.0))
        flux = -tid_flow * jnp.sin(2.0 * jnp.pi * time
                                   / (12.0 * 3600.0)) - riv_flow
        ub_w = (flux / area) + zeros_col
        ub_e = (-riv_flow / area) + zeros_col
        return {"zeta": {"west": zw + zeros_col},
                "ubar": {"west": ub_w, "east": ub_e},
                "vbar": {"west": zeros_col, "east": zeros_col},
                "t": t_east}

    return obc


# ---------------------------------------------------------------------------
# RIVERPLUME1 — buoyant river discharge onto a rotating shelf with KPP
# and a masked coastline (riverplume1.h; ana_grid.h:334-339, 1012-1021;
# ana_initial.h:787-796; ana_mask.h; ana_psource.h:156-174, 347)
# ---------------------------------------------------------------------------

def riverplume_config(Lm: int = 39, Mm: int = 67, N: int = 13,
                      dt: float = 120.0, ndtfast: int = 20,
                      dtype: str = "float64") -> ModelConfig:
    from ..config import GRADIENT, RADIATION
    open_ew = LBC(west=GRADIENT, east=RADIATION, south=GRADIENT,
                  north=GRADIENT)
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=2, Vstretching=4,
                                 theta_s=3.0, theta_b=1.0, Tcline=30.0),
        eos=EOSConfig(),                       # NONLIN_EOS
        mixing=MixingConfig(vmix="lmd", bkpp=True, tnu2=(5.0, 5.0),
                            mix_geo_ts=True),
        drag=BottomDragConfig(kind="quadratic", rdrg2=3.0e-3),
        bc=BoundaryConfig(zeta=open_ew, ubar=open_ew, vbar=open_ew,
                          u=open_ew, v=open_ew, t=open_ew,
                          tke=open_ew),
        rho0=1025.0, gamma2=1.0, dtype=dtype,
    )


def riverplume_grid(cfg: ModelConfig) -> Grid:
    Lm, Mm = cfg.Lm, cfg.Mm
    Mj, Li = cfg.shape2d

    def h2d(xr, yr):
        dx = 58.5e3 / Lm
        i = xr / dx + 0.5
        return np.where(i <= 5.0, 15.0,
                        150.0 + (Lm - i) * (15.0 - 150.0) / (Lm - 6.0))

    rmask = np.ones((Mj, Li))
    # coastline along the west wall with the river-channel gap at
    # j in (Mm-18, Mm-16) (ana_mask.h RIVERPLUME1)
    for i in range(0, min(5, Li - 1) + 1):
        rmask[:Mm - 18 + 1, i] = 0.0
        rmask[Mm - 16:, i] = 0.0
    grid = _plane_grid(cfg, 58.5e3, 201.0e3, 150.0, f0=1.0e-4,
                       h2d=h2d)
    return build_grid(cfg, h=np.asarray(grid.h), pm=np.asarray(grid.pm),
                      pn=np.asarray(grid.pn), f=np.asarray(grid.f),
                      xr=np.asarray(grid.xr), yr=np.asarray(grid.yr),
                      rmask=rmask)


def riverplume_initial(cfg: ModelConfig, grid: Grid) -> State:
    Mj, Li = cfg.shape2d
    k = jnp.arange(1, cfg.N + 1, dtype=cfg.dtype)[:, None, None]
    T = 14.0 + 0.01 * k + jnp.zeros((cfg.N, Mj, Li), cfg.dtype)
    S = jnp.full_like(T, 32.0)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


def riverplume_sources(cfg: ModelConfig, grid: Grid):
    """1500 m3/s river through the western-wall channel face
    (ana_psource.h:156-161, 347: LuvSrc at i=2, j=Mm-17 here — the
    gap in the ana_mask coastline), fresh (S=0) and 14 C."""
    from ..core.sources import make_point_sources
    j_gap = cfg.Mm - 17
    return make_point_sources(
        cfg, locations=[(j_gap, 2)], qbar_values=[1500.0],
        tsrc_values=[(14.0, 0.0)], directions=["u"])


# ---------------------------------------------------------------------------
# WINDBASIN — wind-driven homogeneous rotating basin (windbasin.h;
# ana_grid.h:376-381; ana_initial.h:850-859; ana_smflux.h:331-340)
# ---------------------------------------------------------------------------

def windbasin_config(Lm: int = 101, Mm: int = 52, N: int = 25,
                     dt: float = 300.0, ndtfast: int = 30,
                     dtype: str = "float64") -> ModelConfig:
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=1, Vstretching=1,
                                 theta_s=0.001, theta_b=0.0,
                                 Tcline=1e16),
        eos=EOSConfig(linear=True, R0=1027.0, T0=20.0, S0=35.0,
                      Tcoef=1.7e-4, Scoef=0.0),
        mixing=MixingConfig(visc2=2.0),
        drag=BottomDragConfig(kind="quadratic", rdrg2=3.0e-3),
        bc=BoundaryConfig(),                   # closed basin
        rho0=1025.0, gamma2=1.0, dtype=dtype,
    )


def windbasin_grid(cfg: ModelConfig) -> Grid:
    return _plane_grid(cfg, 2000.0 * cfg.Lm, 1000.0 * cfg.Mm, 50.0,
                       f0=1.0e-4)


def windbasin_initial(cfg: ModelConfig, grid: Grid) -> State:
    Mj, Li = cfg.shape2d
    T = jnp.full((cfg.N, Mj, Li), 20.0, cfg.dtype)   # homogeneous
    S = jnp.full_like(T, cfg.eos.S0)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


def windbasin_forcing_fn(cfg: ModelConfig, grid: Grid):
    """Westward wind ramped over 2 days then constant -0.1 N/m2
    (ana_smflux.h:331-340)."""
    Mj, Li = cfg.shape2d
    dtype = jnp.dtype(cfg.dtype)
    zeros = jnp.zeros((Mj, Li), dtype)
    zerosT = jnp.zeros((cfg.NT, Mj, Li), dtype)

    def forcing(time):
        tdays = time / 86400.0
        amp = jnp.where(tdays <= 2.0,
                        -0.1 * jnp.sin(jnp.pi * tdays / 4.0),
                        -0.1) / cfg.rho0
        return Forcing(sustr=amp + zeros, svstr=zeros, stflx=zerosT,
                       btflx=zerosT, srflx=zeros)

    return forcing


# ---------------------------------------------------------------------------
# LMD_TEST — doubly periodic KPP mixed-layer deepening under a wind
# pulse (lmd_test.h; ana_grid.h; ana_initial.h:719-730;
# ana_smflux.h:236-250)
# ---------------------------------------------------------------------------

def lmd_test_config(Lm: int = 10, Mm: int = 10, N: int = 50,
                    dt: float = 300.0, ndtfast: int = 30,
                    dtype: str = "float64") -> ModelConfig:
    from ..config import PERIODIC
    per = LBC(west=PERIODIC, east=PERIODIC, south=PERIODIC,
              north=PERIODIC)
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=1, Vstretching=1,
                                 theta_s=3.0, theta_b=0.0, Tcline=50.0),
        eos=EOSConfig(),                       # NONLIN_EOS
        mixing=MixingConfig(vmix="lmd", bkpp=True),
        drag=BottomDragConfig(kind="quadratic", rdrg2=3.0e-3),
        bc=BoundaryConfig.uniform(per),
        rho0=1025.0, gamma2=1.0, dtype=dtype,
    )


def lmd_test_grid(cfg: ModelConfig) -> Grid:
    return _plane_grid(cfg, 100.0e3, 100.0e3, 50.0, f0=1.09e-4)


def lmd_test_initial(cfg: ModelConfig, grid: Grid) -> State:
    from ..grid.depth import set_depth
    zeta = jnp.zeros(cfg.shape2d, cfg.dtype)
    z_r, _, _ = set_depth(grid, zeta)
    T = jnp.minimum(13.0, 7.0 + 0.2 * (z_r + 50.0))
    S = jnp.full_like(T, 35.0)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


def lmd_test_forcing_fn(cfg: ModelConfig, grid: Grid):
    """16-hour wind pulse -0.6 sin(pi t/T) sin(2 pi t/T) N/m2
    (ana_smflux.h:236-250)."""
    Mj, Li = cfg.shape2d
    dtype = jnp.dtype(cfg.dtype)
    zeros = jnp.zeros((Mj, Li), dtype)
    zerosT = jnp.zeros((cfg.NT, Mj, Li), dtype)

    def forcing(time):
        amp = jnp.where(
            time <= 57600.0,
            -0.6 * jnp.sin(jnp.pi * time / 57600.0)
            * jnp.sin(2.0 * jnp.pi * time / 57600.0) / cfg.rho0,
            0.0)
        return Forcing(sustr=amp + zeros, svstr=zeros, stflx=zerosT,
                       btflx=zerosT, srflx=zeros)

    return forcing


# ---------------------------------------------------------------------------
# MIXED_LAYER — tiny GLS surface-mixed-layer deepening box
# (mixed_layer.h; ana_grid.h; ana_initial.h:731-742; ana_smflux.h:189-197)
# ---------------------------------------------------------------------------

def mixed_layer_config(Lm: int = 5, Mm: int = 4, N: int = 30,
                       dt: float = 30.0, ndtfast: int = 10,
                       dtype: str = "float64") -> ModelConfig:
    from ..config import PERIODIC
    per = LBC(west=PERIODIC, east=PERIODIC, south=PERIODIC,
              north=PERIODIC)
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=1, Vstretching=1,
                                 theta_s=0.001, theta_b=0.0,
                                 Tcline=1e16),
        eos=EOSConfig(linear=True, R0=1027.0, T0=10.0, S0=35.0,
                      Tcoef=1.7e-4, Scoef=0.0),
        mixing=MixingConfig(vmix="gls"),
        drag=BottomDragConfig(kind="log", Zob=0.02),
        bc=BoundaryConfig.uniform(per),
        rho0=1025.0, gamma2=1.0, uv_cor=False, dtype=dtype,
    )


def mixed_layer_grid(cfg: ModelConfig) -> Grid:
    return _plane_grid(cfg, 500.0, 400.0, 50.0, f0=0.0)


def mixed_layer_initial(cfg: ModelConfig, grid: Grid) -> State:
    from ..grid.depth import set_depth
    zeta = jnp.zeros(cfg.shape2d, cfg.dtype)
    z_r, _, _ = set_depth(grid, zeta)
    T = 10.0 + 3.0 * (z_r + grid.h[None]) / grid.h[None]
    S = jnp.full_like(T, cfg.eos.S0)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


def mixed_layer_forcing_fn(cfg: ModelConfig, grid: Grid):
    """Constant 1e-4 m2/s2 kinematic wind stress (ana_smflux.h:189)."""
    Mj, Li = cfg.shape2d
    dtype = jnp.dtype(cfg.dtype)
    zeros = jnp.zeros((Mj, Li), dtype)
    zerosT = jnp.zeros((cfg.NT, Mj, Li), dtype)
    sustr = jnp.full((Mj, Li), 1.0e-4, dtype)

    def forcing(time):
        return Forcing(sustr=sustr, svstr=zeros, stflx=zerosT,
                       btflx=zerosT, srflx=zeros)

    return forcing


# ---------------------------------------------------------------------------
# SED_TOY — doubly periodic sediment column driven by a prescribed
# current (sed_toy.h; ana_grid.h; ana_initial.h:292-300, 491-499)
# ---------------------------------------------------------------------------

def dogbone_config(Lm: int = 21, Mm: int = 15, N: int = 10,
                   dt: float = 6.0, ndtfast: int = 20,
                   dtype: str = "float64") -> ModelConfig:
    """DOGBONE composite-grid test header physics
    (ROMS/Include/dogbone.h: UV_ADV + UV_QDRAG + MASKING + SALINITY +
    DJ_GRADPS + SPLINES_VDIFF/VVISC + GLS_MIXING KANTHA_CLAYSON;
    deck roms_dogbone_composite.in: dt=6 s, ndtfast=20, zero VISC2/
    TNU2, AKV_BAK=1e-5, RDRG2=3e-3, Vtransform=2/Vstretching=4).
    Grids and contact points come from NGCNAME/GRDNAME files."""
    import dataclasses as _dc
    mixing = MixingConfig(
        vmix="gls", gls_stab="kantha_clayson",
        akv_bak=1.0e-5, akt_bak=(1.0e-6, 1.0e-6),
        splines_vdiff=True, splines_vvisc=True)
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=2, Vstretching=4,
                                 theta_s=0.0, theta_b=0.0,
                                 Tcline=1e16),
        eos=EOSConfig(linear=True, R0=1027.0, T0=14.0, S0=35.0,
                      Tcoef=1.7e-4, Scoef=0.0),
        mixing=mixing,
        drag=BottomDragConfig(kind="quadratic", rdrg2=3.0e-3),
        bc=BoundaryConfig(),            # closed; contacts open edges
        rho0=1025.0, gamma2=1.0, prsgrd="djs",
        uv_cor=False, uv_adv=True, dtype=dtype,
    )


def sed_toy_config(Lm: int = 4, Mm: int = 3, N: int = 20,
                   dt: float = 2.0, ndtfast: int = 10,
                   dtype: str = "float64") -> ModelConfig:
    from ..config import PERIODIC
    per = LBC(west=PERIODIC, east=PERIODIC, south=PERIODIC,
              north=PERIODIC)
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=3, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=1, Vstretching=1,
                                 theta_s=0.001, theta_b=0.0,
                                 Tcline=1e16),
        eos=EOSConfig(linear=True, R0=1027.0, T0=14.0, S0=35.0,
                      Tcoef=1.7e-4, Scoef=0.0),
        mixing=MixingConfig(vmix="gls"),
        drag=BottomDragConfig(kind="log", Zob=0.0005),
        bc=BoundaryConfig.uniform(per),
        rho0=1025.0, gamma2=1.0, uv_cor=False, dtype=dtype,
    )


def sed_toy_grid(cfg: ModelConfig) -> Grid:
    return _plane_grid(cfg, 40.0, 30.0, 0.5, f0=0.0)


def sed_toy_initial(cfg: ModelConfig, grid: Grid) -> State:
    Mj, Li = cfg.shape2d
    T = jnp.full((cfg.N, Mj, Li), 14.0, cfg.dtype)
    S = jnp.full_like(T, 35.0)
    sed0 = jnp.zeros_like(T)
    u = jnp.ones((cfg.N, Mj, Li), cfg.dtype)       # 1 m/s along-flume
    return initial_state(cfg, grid, u=u, t=jnp.stack([T, S, sed0]))


# ---------------------------------------------------------------------------
# BL_TEST — boundary-layers test: NS-periodic cross-shore slice with a
# stretched offshore x-grid, full LMD-KPP (+DDMIX) under COARE bulk
# fluxes with an analytic atmosphere (bl_test.h; ana_grid.h:249-254,
# 520-523, 937-944; ana_initial.h:570-581; ana_winds.h:127-138;
# ana_tair.h:92-97; ana_pair.h:93-98; ana_humid.h:99-104;
# roms_bl_test.in:94-96,232-233,420-422,459-460)
# ---------------------------------------------------------------------------

def bl_test_config(Lm: int = 39, Mm: int = 4, N: int = 30,
                   dt: float = 150.0, ndtfast: int = 30,
                   dtype: str = "float64") -> ModelConfig:
    from ..config import PERIODIC, RADIATION, GRADIENT, CLOSED
    ns_per = dict(south=PERIODIC, north=PERIODIC)
    mom = LBC(west=CLOSED, east=RADIATION, **ns_per)
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=2, Vstretching=4,
                                 theta_s=5.0, theta_b=1.5, Tcline=20.0),
        eos=EOSConfig(linear=False, T0=17.25, S0=31.0),
        mixing=MixingConfig(vmix="lmd", bkpp=True, ddmix=True,
                            solar_source=True,
                            akv_bak=1.0e-5, akt_bak=(1.0e-6, 1.0e-6),
                            splines_vdiff=True, splines_vvisc=True),
        drag=BottomDragConfig(kind="quadratic", rdrg2=3.0e-3),
        bc=BoundaryConfig(
            zeta=LBC(west=CLOSED, east=GRADIENT, **ns_per),
            ubar=mom, vbar=mom, u=mom, v=mom, t=mom, tke=mom),
        rho0=1025.0, gamma2=1.0, dtype=dtype,
    )


def bl_test_grid(cfg: ModelConfig) -> Grid:
    """Offshore-stretched x-grid: dx(i) = 0.5*(4000/(Lm+1))*i + 675 m
    (ana_grid.h:520-523), Esize=5 km, f=9.25e-4; depth
    h(x) = 14 + 25*(1-exp(-pi x 1e-5)) - 8 exp(-((x+500)/15000)^2)
    (ana_grid.h:937-944)."""
    Mj, Li = cfg.shape2d
    i = np.arange(Li, dtype=np.float64)
    j = np.arange(Mj, dtype=np.float64)
    dx = 0.5 * (4000.0 / (cfg.Lm + 1)) * i + 675.0
    dy = 5.0e3 / cfg.Mm
    xr = (dx * (i - 0.5))[None, :] + np.zeros((Mj, 1))
    yr = (dy * (j - 0.5))[:, None] + np.zeros((1, Li))
    pm = np.broadcast_to(1.0 / dx, (Mj, Li)).copy()
    pn = np.full((Mj, Li), 1.0 / dy)
    f = np.full((Mj, Li), 9.25e-4)
    val1 = (xr + 500.0) / 15000.0
    h = (14.0 + 25.0 * (1.0 - np.exp(-np.pi * xr * 1.0e-5))
         - 8.0 * np.exp(-val1 * val1))
    return build_grid(cfg, h=h, pm=pm, pn=pn, f=f, xr=xr, yr=yr)


def bl_test_initial(cfg: ModelConfig, grid: Grid) -> State:
    """T = T0 + 6.25 tanh(1.1 z + 11), S = S0 - 0.75 tanh(1.1 z + 11)
    (ana_initial.h:570-581)."""
    from ..grid.depth import set_depth
    zeta = jnp.zeros(cfg.shape2d, cfg.dtype)
    z_r, _, _ = set_depth(grid, zeta)
    val1 = jnp.tanh(1.1 * z_r + 11.0)
    T = cfg.eos.T0 + 6.25 * val1
    S = cfg.eos.S0 - 0.75 * val1
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


def bl_test_atm_fn(cfg: ModelConfig, grid: Grid):
    """Analytic atmosphere: 10 m/s northward wind (ana_winds.h:127-138),
    Tair=23.567 C, Pair=1013.48 mb, RH=0.776, clear sky, Zillman
    shortwave with 6% albedo on the (non-spherical) grid at lat=0."""
    import math
    from .. import constants
    from ..core.bulk_flux import AtmState
    Mj, Li = cfg.shape2d
    dtype = jnp.dtype(cfg.dtype)
    zeros = jnp.zeros((Mj, Li), dtype)
    Vwind = jnp.full((Mj, Li), 10.0, dtype)
    Tair = jnp.full((Mj, Li), 23.567, dtype)
    Pair = jnp.full((Mj, Li), 1013.48, dtype)
    Hair = jnp.full((Mj, Li), 0.776, dtype)
    Rsolar = 1353.0 / (cfg.rho0 * constants.Cp)
    alb_w = 0.06

    def atm(time):
        tdays = time * constants.sec2day
        yday = jnp.mod(tdays, 365.2425)
        hour = 24.0 * jnp.mod(tdays, 1.0)
        Dangle = (23.44 * jnp.cos((172.0 - yday) * 2.0 * math.pi
                                  / 365.2425)) * constants.deg2rad
        Hangle = (12.0 - hour) * math.pi / 12.0
        zenith = jnp.cos(Dangle) * jnp.cos(Hangle)   # latr = lonr = 0
        cffT = (0.7859 + 0.03477 * 23.567) / (1.0 + 0.00412 * 23.567)
        vap_p = (10.0 ** cffT) * 0.776
        srflx = jnp.where(
            zenith > 0.0,
            Rsolar * zenith * zenith
            / ((zenith + 2.7) * vap_p * 1.0e-3 + 1.085 * zenith + 0.1),
            0.0) * (1.0 - alb_w)
        return AtmState(Uwind=zeros, Vwind=Vwind, Tair=Tair, Pair=Pair,
                        Hair=Hair, cloud=zeros, rain=zeros,
                        srflx=(srflx + zeros).astype(dtype))

    return atm


def bl_test_forcing_fn(cfg: ModelConfig, grid: Grid):
    """BULK_FLUXES + LONGWAVE through COARE (bl_test.h:50-59)."""
    from ..core.bulk_flux import make_bulk_forcing
    return make_bulk_forcing(cfg, bl_test_atm_fn(cfg, grid))


# ---------------------------------------------------------------------------
# FLT_TEST — float-tracking test: EW-periodic 14x12 channel with wall
# rows, a 2x2 center island, constant eastward wind deposited as a body
# force (flt_test.h; ana_grid.h:292-297; ana_mask.h:138-150;
# ana_initial.h:664-672; ana_smflux.h:210-218;
# roms_flt_test3d.in:94-96,232-233; floats_flt_test3d.in)
# ---------------------------------------------------------------------------

def flt_test_config(Lm: int = 14, Mm: int = 12, N: int = 4,
                    dt: float = 512.0, ndtfast: int = 9,
                    dtype: str = "float64") -> ModelConfig:
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=1, NAT=1, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=2, Vstretching=4,
                                 theta_s=0.0, theta_b=0.0, Tcline=1e16),
        eos=EOSConfig(linear=True, T0=20.0, Tcoef=1.7e-4, Scoef=0.0),
        mixing=MixingConfig(akv_bak=1.0e-5, akt_bak=(1.0e-6,),
                            splines_vdiff=True, splines_vvisc=True),
        drag=BottomDragConfig(kind="quadratic", rdrg2=3.0e-3),
        bc=BoundaryConfig.uniform(LBC.ew_periodic()),
        bodyforce=True, levsfrc=1,
        rho0=1025.0, gamma2=1.0, dtype=dtype,
    )


def flt_test_mask(Lm: int, Mm: int) -> np.ndarray:
    """Wall rows at interior j=1 and j=Mm plus a 2x2 island at the
    domain center (ana_mask.h:138-150)."""
    rmask = np.ones((Mm + 2, Lm + 2))
    rmask[1, :] = 0.0
    rmask[Mm, :] = 0.0
    ic, jc = (Lm + 1) // 2, (Mm + 1) // 2
    rmask[jc:jc + 2, ic:ic + 2] = 0.0
    return rmask


def flt_test_grid(cfg: ModelConfig) -> Grid:
    Mj, Li = cfg.shape2d
    dx = dy = 1.0e3
    i = np.arange(Li, dtype=np.float64)
    j = np.arange(Mj, dtype=np.float64)
    xr = (dx * (i - 0.5))[None, :] + np.zeros((Mj, 1))
    yr = (dy * (j - 0.5))[:, None] + np.zeros((1, Li))
    return build_grid(cfg, h=np.full((Mj, Li), 10.0),
                      pm=np.full((Mj, Li), 1.0 / dx),
                      pn=np.full((Mj, Li), 1.0 / dy),
                      f=np.zeros((Mj, Li)), xr=xr, yr=yr,
                      rmask=flt_test_mask(cfg.Lm, cfg.Mm))


def flt_test_initial(cfg: ModelConfig, grid: Grid) -> State:
    Mj, Li = cfg.shape2d
    T = jnp.full((1, cfg.N, Mj, Li), cfg.eos.T0, cfg.dtype)
    return initial_state(cfg, grid, t=T)


def flt_test_forcing_fn(cfg: ModelConfig, grid: Grid):
    """Constant eastward kinematic stress 1e-3 m2/s2
    (ana_smflux.h:210-218), deposited as a body force (BODYFORCE)."""
    Mj, Li = cfg.shape2d
    dtype = jnp.dtype(cfg.dtype)
    zeros = jnp.zeros((Mj, Li), dtype)
    zerosT = jnp.zeros((cfg.NT, Mj, Li), dtype)
    sustr = jnp.full((Mj, Li), 1.0e-3, dtype)

    def forcing(time):
        return Forcing(sustr=sustr, svstr=zeros, stflx=zerosT,
                       btflx=zerosT, srflx=zeros)

    return forcing


# ---------------------------------------------------------------------------
# SHOREFACE — planar-beach surf zone: obliquely/normally incident waves
# shoal and break over a plane slope, the WEC vortex force + Lagrangian
# Stokes transport drive onshore mass flux with a compensating undertow,
# quadratic drag + GLS mixing, wetting/drying at the shoreline and one
# suspended/bedload sand class (shoreface.h CPP set: WEC_VF, WET_DRY,
# GLS_MIXING, UV_QDRAG, SEDIMENT SUSPLOAD+BEDLOAD_MPM; ana_grid.h:374-379,
# 1046-1051 — 1180 m x 140 m, h = 11.75 - 0.0125 x; ana_sediment.h:373-386;
# ana_fsobc.h:130-139 zeta_west = 0; roms_shoreface.in:  Lm=59 Mm=7 N=20
# DT=5 NDTFAST=20 RDRG2=0.0015 DCRIT=0.10, LBC Cha/Fla west, closed east,
# NS periodic; sediment_shoreface.in: SAND_SD50=1 mm WSED=1 mm/s
# ERATE=1e-5 TAU_CE=0.07).
#
# The reference drives SHOREFACE waves from an InWave/SWAN forcing file;
# here the wave field is the analytic equivalent: monochromatic T = 8 s
# waves propagating shoreward (+x), Eckart-dispersion wavelength, with
# the offshore height depth-limited by the McCowan breaking criterion
# H <= 0.78 d so breaking begins where the slope shallows.
# ---------------------------------------------------------------------------

def shoreface_config(Lm: int = 59, Mm: int = 7, N: int = 20,
                     dt: float = 5.0, ndtfast: int = 20,
                     dtype: str = "float64") -> ModelConfig:
    from ..config import (CHAPMAN_IMPLICIT, CLOSED, FLATHER, GRADIENT,
                          PERIODIC)
    zeta = LBC(west=CHAPMAN_IMPLICIT, east=CLOSED,
               south=PERIODIC, north=PERIODIC)
    uv2 = LBC(west=FLATHER, east=CLOSED, south=PERIODIC, north=PERIODIC)
    g3 = LBC(west=GRADIENT, east=CLOSED, south=PERIODIC, north=PERIODIC)
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=3, NAT=2, dt=dt, ndtfast=ndtfast,
        # Vtransform=2 with hc=0: z = zeta + (zeta+h)*Cs(k) stays regular
        # through the h->0 shoreline crossing (Vtransform=1 divides by h)
        vert=VerticalCoordConfig(N=N, Vtransform=2, Vstretching=1,
                                 theta_s=0.0, theta_b=0.0, Tcline=0.0),
        eos=EOSConfig(linear=True, R0=1027.0, T0=14.0, S0=35.0,
                      Tcoef=1.7e-4, Scoef=7.6e-4),
        mixing=MixingConfig(vmix="gls"),
        drag=BottomDragConfig(kind="quadratic", rdrg2=0.0015),
        bc=BoundaryConfig(zeta=zeta, ubar=uv2, vbar=uv2,
                          u=g3, v=g3, t=g3, tke=g3),
        rho0=1025.0, gamma2=1.0, uv_cor=False,
        wetdry=True, Dcrit=0.10, dtype=dtype,
    )


def shoreface_grid(cfg: ModelConfig) -> Grid:
    def h2d(xr, yr):
        return 11.75 - 0.0125 * xr

    return _plane_grid(cfg, 1180.0, 140.0, 11.75, f0=0.0, h2d=h2d)


def shoreface_waves(cfg: ModelConfig, grid: Grid,
                    H0: float = 1.0, T: float = 8.0):
    """wave_fn(t) -> (Hwave, Dwave, Lwave): steady shoreward swell,
    depth-limited by H = min(H0, 0.78 d) (McCowan), wavelength from the
    Eckart (1952) explicit dispersion L = L0 sqrt(tanh(k0 d))."""
    g = cfg.g
    d = jnp.maximum(jnp.asarray(grid.h, cfg.dtype), cfg.Dcrit)
    L0 = g * T * T / (2.0 * jnp.pi)
    Lw = L0 * jnp.sqrt(jnp.tanh(2.0 * jnp.pi * d / L0))
    Hw = jnp.minimum(H0, 0.78 * d)
    Dw = jnp.zeros_like(d)                     # toward +x (the beach)

    def wave_fn(time):
        return (Hw, Dw, Lw)

    return wave_fn


def shoreface_sedconfig():
    from ..core.sediment import SedConfig
    return SedConfig(nsed=1, offset=0, Wsed=(1.0e-3,), Erate=(1.0e-5,),
                     tau_ce=(0.07,), Srho=(2650.0,), d50=(1.0e-3,))


def shoreface_initial(cfg: ModelConfig, grid: Grid) -> State:
    from ..core.sediment import initial_sed
    Mj, Li = cfg.shape2d
    T = jnp.full((cfg.N, Mj, Li), 14.0, cfg.dtype)
    S = jnp.full_like(T, 35.0)
    sand = jnp.zeros_like(T)
    # ana_sediment.h:373-386: 5 m-thick sandy bed, porosity 0.5
    sed0 = initial_sed(cfg, shoreface_sedconfig(),
                       bed_mass0=2650.0 * 0.5 * 5.0)
    # WET_DRY cold start (ini_fields.F wet/dry clamp): a thin Dcrit film
    # over the dry beach so total depth is positive everywhere
    zeta0 = jnp.maximum(jnp.zeros_like(grid.h),
                        cfg.Dcrit - jnp.asarray(grid.h, cfg.dtype))
    return initial_state(cfg, grid, zeta=zeta0,
                         t=jnp.stack([T, S, sand]), sed=sed0)


def shoreface_extras(cfg: ModelConfig, grid: Grid):
    from ..core.sediment import make_sed_hook
    from ..core.wec import make_wec_fn
    return {"wec_fn": make_wec_fn(cfg, grid, shoreface_waves(cfg, grid),
                                  stokes_coupling=True),
            "sed_fn": make_sed_hook(cfg, shoreface_sedconfig(), grid)}


# ---------------------------------------------------------------------------
# CHANNEL (ROMS/Include/channel.h): geostrophically balanced Gaussian
# jet in a periodic f-plane channel (ana_grid.h:255-260,
# ana_initial.h:218-230,349-367; guscale=40 km, u0=1.6 m/s).
# ---------------------------------------------------------------------------

def channel_config(Lm: int = 128, Mm: int = 72, N: int = 10,
                   dt: float = 400.0, ndtfast: int = 20,
                   dtype: str = "float64") -> ModelConfig:
    lbc = LBC.ew_periodic()
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=1, Vstretching=1,
                                 theta_s=0.0, theta_b=0.0,
                                 Tcline=1e16),
        eos=EOSConfig(linear=True, R0=1027.0, T0=14.0, S0=35.0,
                      Tcoef=1.7e-4, Scoef=0.0),
        mixing=MixingConfig(visc2=100.0, tnu2=(5.0, 5.0)),
        drag=BottomDragConfig(kind="linear", rdrg=3.0e-4),
        bc=BoundaryConfig.uniform(lbc),
        rho0=1025.0, gamma2=1.0, dtype=dtype,
    )


def channel_grid(cfg: ModelConfig) -> Grid:
    return _plane_grid(cfg, 600.0e3, 360.0e3, 500.0, f0=1.0e-4)


def channel_initial(cfg: ModelConfig, grid: Grid) -> State:
    from scipy.special import erf
    Mj, Li = cfg.shape2d
    guscale, u0 = 40.0e3, 1.6
    g = cfg.g
    y0 = 0.5 * 360.0e3
    yr = np.asarray(grid.yr)
    f = np.asarray(grid.f)
    # u on U rows = rho rows here (uniform metrics)
    val = (yr - y0) / guscale
    u2d = u0 * np.exp(-val * val) / 6.0
    zeta = (-u0 * guscale * f * np.sqrt(np.pi) / (12.0 * g)
            * erf(val))
    u3 = jnp.asarray(np.broadcast_to(u2d, (cfg.N, Mj, Li)),
                     cfg.dtype)
    T = jnp.full((cfg.N, Mj, Li), 14.0, cfg.dtype)
    S = jnp.full_like(T, 35.0)
    return initial_state(cfg, grid, zeta=jnp.asarray(zeta, cfg.dtype),
                         u=u3, t=jnp.stack([T, S]))


def channel_forcing_fn(cfg: ModelConfig, grid: Grid):
    return zero_forcing(cfg)


# ---------------------------------------------------------------------------
# TEST_CHAN (ROMS/Include/test_chan.h): head-driven flat flume —
# 10 km x 1 km x 10 m, sloped bathymetry h = 10 + 0.404*i/(Lm+1),
# western zeta clamped to 0, eastern ramped to -0.404 m over 150000 s
# (ana_grid.h:1052-1057, ana_fsobc.h:139-154).
# ---------------------------------------------------------------------------

def test_chan_config(Lm: int = 100, Mm: int = 5, N: int = 10,
                     dt: float = 60.0, ndtfast: int = 30,
                     dtype: str = "float64") -> ModelConfig:
    from ..config import CLAMPED, FLATHER, GRADIENT
    # roms_test_chan.in:184-187: Chapman zeta, Flather-west /
    # clamped-east ubar driven by the ana_m2obc.h:229-260 ramped
    # barotropic inflow
    zeta = LBC(west=CLAMPED, east=CLAMPED)
    uv2 = LBC(west=FLATHER, east=CLAMPED)
    uv3 = LBC(west=GRADIENT, east=GRADIENT)
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=1, Vstretching=1,
                                 theta_s=0.0, theta_b=0.0,
                                 Tcline=1e16),
        eos=EOSConfig(linear=True, R0=1027.0, T0=14.0, S0=35.0,
                      Tcoef=0.0, Scoef=0.0),
        mixing=MixingConfig(akv_bak=1.0e-4),
        drag=BottomDragConfig(kind="quadratic", rdrg2=3.0e-3),
        bc=BoundaryConfig(zeta=zeta, ubar=uv2, vbar=uv2, u=uv3,
                          v=uv3, t=uv3),
        rho0=1025.0, gamma2=1.0, uv_cor=False, dtype=dtype,
    )


def test_chan_grid(cfg: ModelConfig) -> Grid:
    def h2d(xr, yr):
        dx = 10000.0 / cfg.Lm
        i = xr / dx + 0.5
        return 10.0 + 0.4040 * i / (cfg.Lm + 1)
    return _plane_grid(cfg, 10000.0, 1000.0, 10.0, f0=0.0, h2d=h2d)


def test_chan_initial(cfg: ModelConfig, grid: Grid) -> State:
    return initial_state(cfg, grid)


def test_chan_obc_fn(cfg: ModelConfig, grid: Grid):
    """ana_fsobc.h TEST_CHAN (west head 0, east ramps to -0.404 m) +
    ana_m2obc.h:229-260: ramped ~1 m/s barotropic through-flow
    (ubar = ramp * 10 m2/s transport / local depth)."""
    Mj, _ = cfg.shape2d
    h_w = jnp.asarray(np.asarray(grid.h)[:, 1], cfg.dtype)
    h_e = jnp.asarray(np.asarray(grid.h)[:, -2], cfg.dtype)

    def obc(time):
        ramp = jnp.minimum(time / 150000.0, 1.0)
        east = -0.4040 * ramp
        return {"zeta": {"west": jnp.zeros((Mj,), cfg.dtype),
                         "east": jnp.full((Mj,), east, cfg.dtype)},
                "ubar": {"west": ramp * 10.0 / h_w,
                         "east": ramp * 10.0 / h_e}}
    return obc


# ---------------------------------------------------------------------------
# SED_TEST1 (ROMS/Include/sed_test1.h): suspended-sediment flume —
# 300 m x 36 m x 10 m, head-driven steady flow (ana_fsobc.h:114-129),
# MY2.5 closure, log drag, one sand class.
# ---------------------------------------------------------------------------

def sed_test1_config(Lm: int = 100, Mm: int = 4, N: int = 16,
                     dt: float = 2.0, ndtfast: int = 10,
                     dtype: str = "float64") -> ModelConfig:
    from ..config import CLAMPED, GRADIENT, RADIATION
    # roms_sed_test1.in:184-185 with the ana_m2obc through-flow
    # expressed as clamped ubar data
    zeta = LBC(west=RADIATION, east=CLAMPED)
    uv2 = LBC(west=CLAMPED, east=CLAMPED)
    uv3 = LBC(west=GRADIENT, east=GRADIENT)
    trc = LBC(west=CLAMPED, east=GRADIENT)
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=3, NAT=2, dt=dt, ndtfast=ndtfast,
        tracer_names=("sand_01",),
        vert=VerticalCoordConfig(N=N, Vtransform=1, Vstretching=1,
                                 theta_s=0.0, theta_b=0.0,
                                 Tcline=1e16),
        eos=EOSConfig(linear=True, R0=1027.0, T0=14.0, S0=35.0,
                      Tcoef=0.0, Scoef=0.0),
        mixing=MixingConfig(vmix="my25"),
        drag=BottomDragConfig(kind="log", Zob=0.0015),
        bc=BoundaryConfig(zeta=zeta, ubar=uv2, vbar=uv2, u=uv3,
                          v=uv3, t=trc, tke=uv3),
        rho0=1025.0, gamma2=1.0, uv_cor=False, dtype=dtype,
    )


def sed_test1_grid(cfg: ModelConfig) -> Grid:
    return _plane_grid(cfg, 300.0, 36.0, 10.0, f0=0.0)


def sed_test1_initial(cfg: ModelConfig, grid: Grid) -> State:
    from ..core.sediment import SedConfig, initial_sed
    Mj, Li = cfg.shape2d
    T = jnp.full((cfg.N, Mj, Li), 14.0, cfg.dtype)
    S = jnp.full_like(T, 35.0)
    sand = jnp.zeros_like(T)
    return initial_state(cfg, grid, t=jnp.stack([T, S, sand]),
                         sed=initial_sed(cfg, SedConfig(nsed=1)))


def sed_test1_obc_fn(cfg: ModelConfig, grid: Grid):
    """ana_fsobc.h SED_TEST1 head + ana_m2obc.h:202-227 prescribed
    westward through-flow ubar = -10 m2/s / D on both ends."""
    Mj, _ = cfg.shape2d
    h_w = jnp.asarray(np.asarray(grid.h)[:, 1], cfg.dtype)
    h_e = jnp.asarray(np.asarray(grid.h)[:, -2], cfg.dtype)

    def obc(time):
        west = 9.0e-6 * 100.0
        east = 9.0e-6 * (cfg.Lm + 1) * 100.0
        return {"zeta": {"west": jnp.full((Mj,), west, cfg.dtype),
                         "east": jnp.full((Mj,), east, cfg.dtype)},
                "ubar": {"west": -10.0 / h_w,
                         "east": -10.0 / h_e}}
    return obc


def sed_test1_extras(cfg: ModelConfig, grid: Grid):
    from ..core.sediment import SedConfig, make_sed_hook
    sed = SedConfig(nsed=1, Srho=(2650.0,), Wsed=(1.0,),
                    Erate=(5.0e-4,), tau_ce=(0.05,))
    return {"obc_fn": sed_test1_obc_fn(cfg, grid),
            "sed_fn": make_sed_hook(cfg, sed, grid)}


# ---------------------------------------------------------------------------
# RIVERPLUME2 (ROMS/Include/riverplume2.h): plume with LMD-KPP +
# rotated diffusion on the RIVERPLUME1 coastline geometry but a
# 100 km x 210 km x 190 m shelf (ana_grid.h:340-345,1022-1031).
# ---------------------------------------------------------------------------

def riverplume2_config(Lm: int = 39, Mm: int = 67, N: int = 13,
                       dt: float = 120.0, ndtfast: int = 20,
                       dtype: str = "float64") -> ModelConfig:
    base = riverplume_config(Lm=Lm, Mm=Mm, N=N, dt=dt,
                             ndtfast=ndtfast, dtype=dtype)
    return base.replace(
        eos=EOSConfig(linear=False),
        mixing=MixingConfig(vmix="lmd", bkpp=True, tnu2=(5.0, 5.0),
                            mix_geo_ts=True, solar_source=False),
        drag=BottomDragConfig(kind="quadratic", rdrg2=3.0e-3))


def riverplume2_grid(cfg: ModelConfig) -> Grid:
    Lm, Mm = cfg.Lm, cfg.Mm
    Mj, Li = cfg.shape2d

    def h2d(xr, yr):
        dx = 100.0e3 / Lm
        i = xr / dx + 0.5
        return np.where(i <= 5.0, 15.0,
                        190.0 + (Lm - i) * (15.0 - 190.0) / (Lm - 6.0))

    rmask = np.ones((Mj, Li))
    for i in range(0, min(5, Li - 1) + 1):
        rmask[:Mm - 18 + 1, i] = 0.0
        rmask[Mm - 16:, i] = 0.0
    grid = _plane_grid(cfg, 100.0e3, 210.0e3, 190.0, f0=1.0e-4,
                       h2d=h2d)
    return build_grid(cfg, h=np.asarray(grid.h),
                      pm=np.asarray(grid.pm), pn=np.asarray(grid.pn),
                      f=np.asarray(grid.f), xr=np.asarray(grid.xr),
                      yr=np.asarray(grid.yr), rmask=rmask)


def riverplume2_initial(cfg: ModelConfig, grid: Grid) -> State:
    return riverplume_initial(cfg, grid)


def riverplume2_extras(cfg: ModelConfig, grid: Grid):
    return {"sources": riverplume_sources(cfg, grid)}


# ---------------------------------------------------------------------------
# LAB_CANYON (ROMS/Include/lab_canyon.h): rotating-table polar annulus
# with a shelf-break canyon (ana_grid.h:305-309,483-514,960-991).
# Curvilinear metrics (CURVGRID) with variable azimuthal spacing.
# ---------------------------------------------------------------------------

def lab_canyon_config(Lm: int = 48, Mm: int = 72, N: int = 10,
                      dt: float = 0.05, ndtfast: int = 10,
                      dtype: str = "float64") -> ModelConfig:
    from ..config import CLOSED, PERIODIC
    lbc = LBC(west=CLOSED, east=CLOSED, south=PERIODIC,
              north=PERIODIC)
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=1, Vstretching=1,
                                 theta_s=0.0, theta_b=0.0,
                                 Tcline=1e16),
        eos=EOSConfig(linear=True, R0=1027.0, T0=14.0, S0=35.0,
                      Tcoef=1.7e-4, Scoef=0.0),
        mixing=MixingConfig(visc2=1.0e-5, tnu2=(1.0e-6, 1.0e-6),
                            mix_geo_ts=True),
        drag=BottomDragConfig(kind="linear", rdrg=3.0e-4),
        bc=BoundaryConfig.uniform(lbc),
        rho0=1025.0, gamma2=1.0, curvgrid=True, dtype=dtype,
    )


def lab_canyon_grid(cfg: ModelConfig) -> Grid:
    """Polar annulus r in [0.35, 0.90] m with variable azimuthal
    spacing and the canyon notch in the shelf break."""
    Lm, Mm = cfg.Lm, cfg.Mm
    Mj, Li = cfg.shape2d
    Xsize = 0.55
    dx = Xsize / Lm
    dth = 0.01
    twopi = 2.0 * np.pi
    cffF = (4.0 * np.pi / (dth * Mm)) - 1.0

    jj = np.arange(Mj, dtype=np.float64)[:, None]
    ii = np.arange(Li, dtype=np.float64)[None, :]
    # rho points (i-1+0.5, j-1+0.5) in the reference's 1-based layout
    r = 0.35 + dx * (ii - 0.5)
    theta = -np.pi + 0.5 * dth * (
        (cffF + 1.0) * (jj - 0.5)
        + (cffF - 1.0) * (Mm / twopi) * np.sin(twopi * (jj - 0.5)
                                               / Mm))
    xr = r * np.cos(theta) + 0.0 * jj
    yr = r * np.sin(theta) + 0.0 * ii
    # metrics: pm = 1/dr; pn = 1/(r dtheta_j)
    dth_j = 0.5 * dth * ((cffF + 1.0)
                         + (cffF - 1.0) * np.cos(twopi * (jj - 0.5)
                                                 / Mm))
    pm = np.broadcast_to(1.0 / dx, (Mj, Li)).copy()
    pn = 1.0 / (r * dth_j) + 0.0 * jj
    angler = np.broadcast_to(theta, (Mj, Li)).copy()

    # bathymetry (ana_grid.h:960-991): shelf 0.025 m, deep 0.125 m,
    # canyon notch where |theta| < 2/11
    val1 = 0.55 - 0.15 * np.cos(np.pi * theta * 0.55 / 0.2) ** 2
    val2 = 0.15 + 0.15 * np.cos(np.pi * theta * 0.55 / 0.2) ** 2
    r2 = np.broadcast_to(r, (Mj, Li))
    th2 = np.broadcast_to(theta, (Mj, Li))
    v1 = np.broadcast_to(val1, (Mj, Li))
    v2 = np.broadcast_to(val2, (Mj, Li))
    h_out = np.where(r2 <= 0.55, 0.025,
                     np.where(r2 >= 0.7, 0.125,
                              0.125 - 0.1 * np.cos(
                                  0.5 * np.pi * (r2 - 0.55) / 0.15)
                              ** 2))
    h_in = np.where(r2 <= v1, 0.025,
                    np.where(r2 >= 0.7, 0.125,
                             0.125 - 0.1 * np.cos(
                                 0.5 * np.pi * (r2 - v1)
                                 / np.maximum(v2, 1e-9)) ** 2))
    h = np.where(np.abs(th2) >= 0.181818181818, h_out, h_in)

    f0 = 4.0 * np.pi / 25.0
    return build_grid(cfg, h=h, pm=pm,
                      pn=np.broadcast_to(pn, (Mj, Li)).copy(),
                      f=np.full((Mj, Li), f0), xr=xr, yr=yr,
                      angler=angler,
                      dndx=None, dmde=None)


def lab_canyon_initial(cfg: ModelConfig, grid: Grid) -> State:
    Mj, Li = cfg.shape2d
    T = jnp.full((cfg.N, Mj, Li), 14.0, cfg.dtype)
    S = jnp.full_like(T, 35.0)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


# ---------------------------------------------------------------------------
# BIO_TOY — one-dimensional (vertical) biology toy (bio_toy.h):
# LMD-KPP (RIMIX+CONVEC+SKPP+BKPP+NONLOCAL), COARE bulk fluxes with
# longwave, solar source, DJ_GRADPS, nonlinear EOS + salinity.  The
# reference drives it from roms_test NetCDF files (4x4x30 box); the
# analytical fallback here is the same flat box with a stratified
# profile so the deck runs self-contained.
# ---------------------------------------------------------------------------

def bio_toy_config(Lm: int = 4, Mm: int = 4, N: int = 30,
                   dt: float = 1800.0, ndtfast: int = 30,
                   dtype: str = "float64") -> ModelConfig:
    from ..config import PERIODIC
    per = LBC(west=PERIODIC, east=PERIODIC, south=PERIODIC,
              north=PERIODIC)
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=2, Vstretching=4,
                                 theta_s=5.0, theta_b=0.4,
                                 Tcline=50.0),
        eos=EOSConfig(),                       # NONLIN_EOS + SALINITY
        mixing=MixingConfig(vmix="lmd", bkpp=True,
                            solar_source=True),
        drag=BottomDragConfig(kind="quadratic", rdrg2=3.0e-3),
        bc=BoundaryConfig.uniform(per),
        rho0=1025.0, gamma2=1.0, dtype=dtype,
    )


def bio_toy_grid(cfg: ModelConfig) -> Grid:
    return _plane_grid(cfg, 10.0e3, 10.0e3, 200.0, f0=8.0e-5)


def bio_toy_initial(cfg: ModelConfig, grid: Grid) -> State:
    from ..grid.depth import set_depth
    zeta = jnp.zeros(cfg.shape2d, cfg.dtype)
    z_r, _, _ = set_depth(grid, zeta)
    T = 14.0 + 8.0 * jnp.exp(z_r / 50.0)
    S = 35.0 - 0.5 * jnp.exp(z_r / 80.0)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


def bio_toy_forcing_fn(cfg: ModelConfig, grid: Grid):
    """BULK_FLUXES + LONGWAVE (bio_toy.h:40-43) with the bl_test
    analytic atmosphere at a gentler 5 m/s wind."""
    import jax.numpy as _j
    from ..core.bulk_flux import AtmState, make_bulk_forcing
    base_atm = bl_test_atm_fn(cfg, grid)

    def atm(time):
        a = base_atm(time)
        return a._replace(Vwind=0.5 * a.Vwind)
    return make_bulk_forcing(cfg, atm)


# ---------------------------------------------------------------------------
# WEDDELL — idealized Weddell Sea shelf with an ICE SHELF cavity
# (weddell.h): NS-periodic strip, W/E open with M2 tidal boundary data
# (ana_fsobc.h:155-176, ana_m2obc.h:300-345), piecewise shelf-slope
# bathymetry and a 340 m ice draft over the western 20 columns
# (ana_grid.h:1084-1111,1168-1181), angler = 90 deg, latitude-dependent
# f starting at 79S (ana_grid.h:877-884), rest initial state at
# T0=-0.2775 C / S0=34.6489 (roms_weddell.in:459-460).
# ---------------------------------------------------------------------------

def weddell_config(Lm: int = 300, Mm: int = 10, N: int = 30,
                   dt: float = 50.0, ndtfast: int = 20,
                   dtype: str = "float64") -> ModelConfig:
    from ..config import (CHAPMAN_IMPLICIT, FLATHER, GRADIENT,
                          PERIODIC, RADIATION)
    def lbc(we):
        return LBC(west=we, east=we, south=PERIODIC, north=PERIODIC)
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=1, Vstretching=1,
                                 theta_s=3.0, theta_b=0.0,
                                 Tcline=50.0),
        eos=EOSConfig(),
        mixing=MixingConfig(vmix="constant", visc2=50.0,
                            tnu2=(10.0, 10.0)),
        drag=BottomDragConfig(kind="quadratic", rdrg2=3.0e-3),
        bc=BoundaryConfig(
            zeta=lbc(CHAPMAN_IMPLICIT), ubar=lbc(FLATHER),
            vbar=lbc(FLATHER), u=lbc(RADIATION), v=lbc(RADIATION),
            t=lbc(RADIATION), tke=lbc(GRADIENT)),
        rho0=1025.0, gamma2=1.0, dtype=dtype, curvgrid=True,
    )


def _weddell_h_table():
    """The 237-knot shelf/slope profile (ana_grid.h:1084-1101)."""
    val1, val2 = 98.80, 0.8270
    ks = np.arange(-1, 236)
    xw = np.empty(ks.shape)
    hw = np.empty(ks.shape)
    for n, k in enumerate(ks):
        if k <= 26:
            xw[n] = (k - 1) * 15.0e3
            hw[n] = 375.0
        elif k <= 232:
            zwrk = -2.0 + (k - 1) * 0.020
            xw[n] = (520.0 + val1 + zwrk * val1
                     + val1 * val2 * np.log(np.cosh(zwrk))) * 1.0e3
            hw[n] = -75.0 + 2198.0 * (1.0 + val2 * np.tanh(zwrk))
        else:
            xw[n] = (850.0 + (k - 228) * 50.0) * 1.0e3
            hw[n] = 4000.0
    return xw, hw


def weddell_grid(cfg: ModelConfig) -> Grid:
    Mj, Li = cfg.shape2d
    dx = dy = 4000.0
    i = np.arange(Li)
    j = np.arange(Mj)
    xr1 = (i - 0.5) * dx
    xr = np.broadcast_to(xr1[None, :], (Mj, Li)).copy()
    yr = np.broadcast_to(((j - 0.5) * dy)[:, None], (Mj, Li)).copy()
    xw, hw = _weddell_h_table()
    h1 = np.interp(xr1, xw, hw, left=375.0, right=4000.0)
    h = np.broadcast_to(h1[None, :], (Mj, Li)).copy()
    # f from latitude -79 + (i-1)*10.4/Lm degrees (ana_grid.h:877-884)
    lat = -79.0 + (i - 1.0) * 10.4 / cfg.Lm
    f1 = 2.0 * 7.2e-5 * np.sin(np.deg2rad(lat))
    f = np.broadcast_to(f1[None, :], (Mj, Li)).copy()
    # ice shelf: -340 m for i<=4, ramp to 0 at i=20 (ana_grid.h:
    # 1168-1181; reference i is 1-based interior = our column index)
    val1, val2 = 340.0, 340.0 / 16.0
    zice1 = np.where(i > 20, 0.0,
                     np.where(i > 4, -val1 + (i - 1.0) * val2, -val1))
    zice = np.broadcast_to(zice1[None, :], (Mj, Li)).copy()
    pm = np.full((Mj, Li), 1.0 / dx)
    pn = np.full((Mj, Li), 1.0 / dy)
    return build_grid(cfg, h=h, pm=pm, pn=pn, f=f, xr=xr, yr=yr,
                      angler=np.full((Mj, Li), 0.5 * np.pi),
                      zice=zice)


def weddell_initial(cfg: ModelConfig, grid: Grid) -> State:
    Mj, Li = cfg.shape2d
    T = jnp.full((cfg.N, Mj, Li), -0.2775, cfg.dtype)
    S = jnp.full_like(T, 34.6489)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


def weddell_obc_fn(cfg: ModelConfig, grid: Grid):
    """M2 tidal boundary data at the W/E edges (ana_fsobc.h:155-176,
    ana_m2obc.h:300-345): tanh spin-up ramp, amplitude/phase linearly
    extrapolated across the domain, tidal ellipse rotated by the
    local angler (= 90 deg)."""
    Mj = cfg.shape2d[0]
    Li = cfg.shape2d[1]
    deg2rad = np.pi / 180.0
    zeros_col = jnp.zeros((Mj,), cfg.dtype)
    Tm2 = 12.42 * 3600.0
    ang = 0.5 * np.pi                         # angler everywhere

    def edge(frac):
        # frac=1/(Iend+1) for west, 1 for east (reference expressions)
        val = 0.53 + (0.53 - 0.48) * frac
        phase = (277.0 + (277.0 - 240.0) * frac) * deg2rad
        minor = 0.0143 + (0.0143 + 0.010) * frac
        major = 0.1144 + (0.1144 - 0.013) * frac
        mphase = (318.0 + (318.0 - 355.0) * frac) * deg2rad
        mangle = (125.0 + (125.0 - 25.0) * frac) * deg2rad
        return val, phase, minor, major, mphase, mangle

    west = edge(1.0 / Li)
    east = edge(1.0)

    def obc(time):
        fac = jnp.tanh(time / 86400.0)
        om = 2.0 * jnp.pi * time / Tm2
        out = {"zeta": {}, "ubar": {}, "vbar": {}}
        for side, (val, phase, minor, major, mphase, mangle) in (
                ("west", west), ("east", east)):
            out["zeta"][side] = fac * val * jnp.cos(om - phase) \
                + zeros_col
            ub = fac * (major * jnp.cos(mangle - ang)
                        * jnp.cos(om - mphase)
                        - minor * jnp.sin(mangle - ang)
                        * jnp.sin(om - mphase))
            vb = fac * (major * jnp.sin(mangle - ang)
                        * jnp.cos(om - mphase)
                        - minor * jnp.sin(mangle - ang)
                        * jnp.cos(om - mphase))
            out["ubar"][side] = ub + zeros_col
            out["vbar"][side] = vb + zeros_col
        return out

    return obc


# ---------------------------------------------------------------------------
# COUPLING_TEST — atmosphere-ocean coupling benchmark box
# (coupling_test.h): flat 1500 m f-plane box, ana_vmix, stratified
# initial temperature (ana_initial.h:617-630); the coupled forcing
# normally arrives through the ESMF/NUOPC seam (core/coupling.py
# import overrides), standalone it runs with zero analytic forcing.
# ---------------------------------------------------------------------------

def coupling_test_config(Lm: int = 24, Mm: int = 24, N: int = 16,
                         dt: float = 300.0, ndtfast: int = 30,
                         dtype: str = "float64") -> ModelConfig:
    closed = LBC()
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=1, Vstretching=1,
                                 theta_s=5.0, theta_b=0.4,
                                 Tcline=50.0),
        eos=EOSConfig(linear=True),
        mixing=MixingConfig(vmix="ana"),
        drag=BottomDragConfig(kind="quadratic", rdrg2=3.0e-3),
        bc=BoundaryConfig.uniform(closed),
        rho0=1025.0, gamma2=1.0, dtype=dtype,
    )


def coupling_test_grid(cfg: ModelConfig) -> Grid:
    return _plane_grid(cfg, 6000.0 * cfg.Lm, 6000.0 * cfg.Mm,
                       1500.0, f0=5.0e-5)


def coupling_test_initial(cfg: ModelConfig, grid: Grid) -> State:
    from ..grid.depth import set_depth
    zeta = jnp.zeros(cfg.shape2d, cfg.dtype)
    z_r, _, _ = set_depth(grid, zeta)
    T = 40.0 * jnp.exp(z_r / 800.0) * \
        (0.6 - 0.4 * jnp.tanh(z_r / 800.0)) + 1.5
    S = jnp.full_like(T, 35.0)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


# ---------------------------------------------------------------------------
# LAKE_JERSEY — wave-current BBL + sediment lake (lake_jersey.h):
# SSW_BBL with analytic waves (ANA_WWAVE generic branch: Hwave 0.5 m,
# Pwave 10 s), suspended+Soulsby-bedload sediment (ANA_SEDIMENT),
# MASKING, nonlinear EOS.  The reference drives it from roms_test
# grid files; the analytical fallback is an elliptic masked lake.
# ---------------------------------------------------------------------------

def lake_jersey_config(Lm: int = 40, Mm: int = 24, N: int = 8,
                       dt: float = 30.0, ndtfast: int = 10,
                       dtype: str = "float64") -> ModelConfig:
    closed = LBC()
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=2, Vstretching=4,
                                 theta_s=3.0, theta_b=0.7,
                                 Tcline=5.0),
        eos=EOSConfig(),
        mixing=MixingConfig(vmix="gls"),
        drag=BottomDragConfig(kind="quadratic", rdrg2=3.0e-3),
        bc=BoundaryConfig.uniform(closed),
        rho0=1000.0, gamma2=1.0, dtype=dtype,
    )


def lake_jersey_grid(cfg: ModelConfig) -> Grid:
    Mj, Li = cfg.shape2d
    dx, dy = 200.0, 200.0
    i = np.arange(Li)
    j = np.arange(Mj)
    X, Y = np.meshgrid((i - 0.5) * dx, (j - 0.5) * dy)
    x0, y0 = 0.5 * cfg.Lm * dx, 0.5 * cfg.Mm * dy
    r = np.sqrt(((X - x0) / (0.45 * cfg.Lm * dx)) ** 2
                + ((Y - y0) / (0.45 * cfg.Mm * dy)) ** 2)
    rmask = (r < 1.0).astype(np.float64)
    h = np.maximum(2.0, 12.0 * (1.0 - r * r))
    pm = np.full((Mj, Li), 1.0 / dx)
    pn = np.full((Mj, Li), 1.0 / dy)
    return build_grid(cfg, h=h, pm=pm, pn=pn,
                      f=np.full((Mj, Li), 9.37e-5), xr=X, yr=Y,
                      rmask=rmask)


def lake_jersey_initial(cfg: ModelConfig, grid: Grid) -> State:
    Mj, Li = cfg.shape2d
    T = jnp.full((cfg.N, Mj, Li), 20.0, cfg.dtype)
    S = jnp.full_like(T, 0.05)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


def lake_jersey_forcing_fn(cfg: ModelConfig, grid: Grid):
    """Steady 0.1 N/m2 along-lake wind (ana_smflux-style)."""
    Mj, Li = cfg.shape2d
    dtype = jnp.dtype(cfg.dtype)
    zeros = jnp.zeros((Mj, Li), dtype)
    zerosT = jnp.zeros((cfg.NT, Mj, Li), dtype)
    amp = 0.1 / cfg.rho0

    def forcing(time):
        return Forcing(sustr=amp + zeros, svstr=zeros, stflx=zerosT,
                       btflx=zerosT, srflx=zeros)
    return forcing


def lake_jersey_extras(cfg: ModelConfig, grid: Grid):
    """SSW BBL with analytic waves (ana_wwave generic branch: Hwave
    0.5 m, Pwave_bot 10 s); sediment classes arrive via the deck's
    SPARNAM keyword (sediment_lake_jersey.in)."""
    from ..core.bbl import BBLConfig, make_ssw_bbl_fn
    Mj, Li = cfg.shape2d
    Hw = jnp.full((Mj, Li), 0.5, cfg.dtype)
    Dw = jnp.zeros((Mj, Li), cfg.dtype)
    Pw = jnp.full((Mj, Li), 10.0, cfg.dtype)

    def wave_fn(time):
        return Hw, Dw, Pw

    return {"bbl_fn": make_ssw_bbl_fn(cfg, BBLConfig(), grid,
                                      wave_fn)}


# ---------------------------------------------------------------------------
# TEST_HEAD — tidal inlet with waves (test_head.h): WET_DRY, WEC_VF,
# SSH/UV tides through the reduced FSOBC (FSOBC_REDUCED + ANA_FSOBC/
# ANA_M2OBC), UV_LOGDRAG, MY25 mixing, sediment via SPARNAM
# (sediment_test_head.in).  The reference couples to SWAN for the wave
# field; standalone the waves come from an FRCNAME wave file
# (io/forcing.py WAVE branch) or the analytic default here.
# ---------------------------------------------------------------------------

def test_head_config(Lm: int = 56, Mm: int = 40, N: int = 8,
                     dt: float = 20.0, ndtfast: int = 10,
                     dtype: str = "float64") -> ModelConfig:
    from ..config import GRADIENT, REDUCED
    closed = LBC()
    south_open = LBC(south=REDUCED)
    south_grad = LBC(south=GRADIENT)
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=2, Vstretching=4,
                                 theta_s=3.0, theta_b=0.7,
                                 Tcline=5.0),
        eos=EOSConfig(linear=True),
        mixing=MixingConfig(vmix="my25"),
        drag=BottomDragConfig(kind="log", Zob=0.005),
        bc=BoundaryConfig(
            zeta=south_open, ubar=south_open, vbar=south_open,
            u=south_grad, v=south_grad, t=south_grad,
            tke=south_grad),
        rho0=1025.0, gamma2=1.0, dtype=dtype, wetdry=True,
        Dcrit=0.1,
    )


def test_head_grid(cfg: ModelConfig) -> Grid:
    """Inlet geometry: open sea strip at the south, a narrow inlet
    through a barrier row, and a shallow back-bay with drying flats
    (the inlet_test/test_head planform)."""
    Mj, Li = cfg.shape2d
    dx = dy = 100.0
    i = np.arange(Li)
    j = np.arange(Mj)
    X, Y = np.meshgrid((i - 0.5) * dx, (j - 0.5) * dy)
    jbar = Mj // 3
    h = np.where(Y < jbar * dy, 8.0,
                 np.maximum(0.5, 3.0 - 2.5 * (Y - jbar * dy)
                            / ((Mj - jbar) * dy)))
    rmask = np.ones((Mj, Li))
    inlet_lo, inlet_hi = Li // 2 - 3, Li // 2 + 3
    barrier = (np.abs(j[:, None] - jbar) <= 1) & \
        ((i[None, :] < inlet_lo) | (i[None, :] > inlet_hi))
    rmask[barrier] = 0.0
    pm = np.full((Mj, Li), 1.0 / dx)
    pn = np.full((Mj, Li), 1.0 / dy)
    return build_grid(cfg, h=h, pm=pm, pn=pn,
                      f=np.full((Mj, Li), 9.0e-5), xr=X, yr=Y,
                      rmask=rmask)


def test_head_initial(cfg: ModelConfig, grid: Grid) -> State:
    Mj, Li = cfg.shape2d
    T = jnp.full((cfg.N, Mj, Li), 15.0, cfg.dtype)
    S = jnp.full_like(T, 32.0)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


def test_head_obc_fn(cfg: ModelConfig, grid: Grid):
    """M2 tide at the southern sea boundary (ana_fsobc.h
    FSOBC_REDUCED pattern: zeta data only; the reduced-physics
    ubar/vbar follow from the surface slope)."""
    Li = cfg.shape2d[1]
    zeros_row = jnp.zeros((Li,), cfg.dtype)

    def obc(time):
        zs = 0.5 * jnp.sin(2.0 * jnp.pi * time / (12.42 * 3600.0))
        return {"zeta": {"south": zs + zeros_row}}
    return obc


def test_head_extras(cfg: ModelConfig, grid: Grid):
    from ..core.wec import make_wec_fn
    Mj, Li = cfg.shape2d
    Hw = jnp.full((Mj, Li), 0.4, cfg.dtype)
    Dw = jnp.full((Mj, Li), 0.5 * jnp.pi, cfg.dtype)
    Lw = jnp.full((Mj, Li), 50.0, cfg.dtype)

    def wave_fn(time):
        return Hw, Dw, Lw

    return {"wec_fn": make_wec_fn(cfg, grid, wave_fn,
                                  stokes_coupling=True),
            "obc_fn": test_head_obc_fn(cfg, grid)}


# ---------------------------------------------------------------------------
# DAMEE_4 — North Atlantic DAMEE #4 (damee_4.h): data-driven spherical
# grid (GRDNAME/ININAME from roms_test), LMD-KPP
# (RIMIX+CONVEC+SKPP+NONLOCAL), nonlinear EOS, MASKING/CURVGRID,
# QCORRECTION + SRELAXATION from FRCNAME SST/dQdSST/SSS data.  This
# factory carries only the header physics; grids come from files.
# ---------------------------------------------------------------------------

def damee4_config(Lm: int = 128, Mm: int = 128, N: int = 20,
                  dt: float = 1800.0, ndtfast: int = 45,
                  dtype: str = "float64") -> ModelConfig:
    closed = LBC()
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=2, Vstretching=2,
                                 theta_s=7.0, theta_b=0.1,
                                 Tcline=200.0),
        eos=EOSConfig(),
        mixing=MixingConfig(vmix="lmd", tnu2=(100.0, 100.0),
                            visc2=0.0),
        drag=BottomDragConfig(kind="linear", rdrg=3.0e-4),
        bc=BoundaryConfig.uniform(closed),
        rho0=1025.0, gamma2=1.0, dtype=dtype, curvgrid=True,
    )


# ---------------------------------------------------------------------------
# WC13 — California Current 4D-Var tutorial (wc13.h): data-driven
# spherical grid (roms_test files); header physics: GLS mixing,
# COARE bulk fluxes with diurnal shortwave + EminusP, MIX_GEO_TS,
# harmonic mixing, quadratic drag, nonlinear EOS.  The 4D-Var drivers
# themselves are the assim library (assim/i4dvar.py, rbl4dvar,
# r4dvar, controls, split); this factory carries the nonlinear basic
# state's physics for GRDNAME/ININAME/FRCNAME decks.
# ---------------------------------------------------------------------------

def wc13_config(Lm: int = 72, Mm: int = 48, N: int = 30,
                dt: float = 3600.0, ndtfast: int = 60,
                dtype: str = "float64") -> ModelConfig:
    closed = LBC()
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=1, Vstretching=1,
                                 theta_s=6.5, theta_b=1.5,
                                 Tcline=100.0),
        eos=EOSConfig(),
        mixing=MixingConfig(vmix="gls", visc2=4.0, tnu2=(5.0, 5.0),
                            mix_geo_ts=True, solar_source=True),
        drag=BottomDragConfig(kind="quadratic", rdrg2=3.0e-3),
        bc=BoundaryConfig.uniform(closed),
        rho0=1025.0, gamma2=1.0, dtype=dtype, curvgrid=True,
    )


# ---------------------------------------------------------------------------
# CHANNEL_NECK — channel with a constriction (channel_neck.h), the
# reference's CORRELATION / 4D-Var sanity application.  Header
# physics: DJ_GRADPS pressure gradient, UV_VIS2 + MIX_GEO_UV rotated
# momentum mixing, linear bottom drag, MASKING, analytic vertical
# mixing (ana_vmix.h:116-122, 240-247:
#     Akv = 2e-4 + 8e-4 exp(z_w/5),  Akt = 2e-6 + 8e-6 exp(z_w/5))
# and a constant westward wind (ana_smflux.h:175-186:
# sustr = -0.01/rho0).  The reference reads the neck geometry from an
# unshipped grid NetCDF (roms_channel_neck1.in GRDNAME); the native
# grid synthesizes it: a 100 km EW-periodic, 40 km wide, 20 m deep
# f-plane channel whose masked coastline pinches to ~40% width
# through a Gaussian neck at mid-channel.  Initial state is 20 C at
# rest (ana_initial.h:608-616).  The CORRELATION driver itself is
# assim/symmetry.py:correlation_map over the diffusion-B square root.
# ---------------------------------------------------------------------------

def channel_neck_config(Lm: int = 128, Mm: int = 40, N: int = 16,
                        dt: float = 120.0, ndtfast: int = 24,
                        dtype: str = "float64") -> ModelConfig:
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=1, Vstretching=1,
                                 theta_s=3.0, theta_b=0.0,
                                 Tcline=20.0),
        eos=EOSConfig(linear=True, T0=20.0),
        mixing=MixingConfig(vmix="ana", visc2=5.0, mix_geo_uv=True),
        drag=BottomDragConfig(kind="linear", rdrg=3.0e-4),
        bc=BoundaryConfig.uniform(LBC.ew_periodic()),
        rho0=1025.0, gamma2=1.0, prsgrd="djs",
        uv_cor=True, uv_adv=True, dtype=dtype,
    )


def channel_neck_grid(cfg: ModelConfig) -> Grid:
    Mj, Li = cfg.shape2d
    Xsize, Esize = 100.0e3, 40.0e3
    grid = _plane_grid(cfg, Xsize, Esize, 20.0, f0=1.0e-4)
    xr, yr = np.asarray(grid.xr), np.asarray(grid.yr)
    # Gaussian neck: the land encroaches symmetrically from both
    # walls, narrowest (~40% of Esize open) at x = Xsize/2.
    pinch = 0.3 * Esize * np.exp(-((xr - 0.5 * Xsize)
                                   / (0.15 * Xsize)) ** 2)
    rmask = ((yr > pinch) & (yr < Esize - pinch)).astype(np.float64)
    return build_grid(cfg, h=np.asarray(grid.h),
                      pm=np.asarray(grid.pm), pn=np.asarray(grid.pn),
                      f=np.asarray(grid.f), xr=xr, yr=yr, rmask=rmask)


def channel_neck_initial(cfg: ModelConfig, grid: Grid) -> State:
    Mj, Li = cfg.shape2d
    T = jnp.full((cfg.N, Mj, Li), 20.0, cfg.dtype)
    S = jnp.full_like(T, cfg.eos.S0)
    return initial_state(cfg, grid, t=jnp.stack([T, S]))


def channel_neck_forcing_fn(cfg: ModelConfig, grid: Grid):
    """Constant westward wind stress, sustr = -0.01/rho0 kinematic
    (ana_smflux.h:175-186; the ramped variant is commented out in the
    reference too)."""
    Mj, Li = cfg.shape2d
    dtype = jnp.dtype(cfg.dtype)
    zeros = jnp.zeros((Mj, Li), dtype)
    zerosT = jnp.zeros((cfg.NT, Mj, Li), dtype)
    sustr = jnp.full((Mj, Li), -0.01 / cfg.rho0, dtype)

    def forcing(time):
        return Forcing(sustr=sustr, svstr=zeros, stflx=zerosT,
                       btflx=zerosT, srflx=zeros)

    return forcing


def channel_neck_vmix(cfg: ModelConfig):
    """Surface-intensified analytic profiles (ana_vmix.h CHANNEL_NECK,
    5 m e-folding): Akv on all W interfaces, Akt on temperature only
    (salinity keeps the akt_bak background, matching the reference's
    itemp-only loop)."""
    def vmix(state, grid, z_w):
        Akv = 2.0e-4 + 8.0e-4 * jnp.exp(z_w / 5.0)
        Akt_T = 2.0e-6 + 8.0e-6 * jnp.exp(z_w / 5.0)
        Akt = jnp.stack([Akt_T] + [
            jnp.full_like(z_w, cfg.mixing.akt_bak[min(
                i, len(cfg.mixing.akt_bak) - 1)])
            for i in range(1, cfg.NAT)])
        return Akv, Akt
    return vmix
