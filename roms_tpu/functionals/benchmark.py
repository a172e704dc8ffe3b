"""BENCHMARK analytical application — idealized Southern Ocean channel.

The reference's scaling benchmark (ROMS/Include/benchmark.h,
ROMS/External/roms_benchmark{1,2,3}.in): spherical 360-degree zonal
channel at 70S-50S, 4000 m deep, EW-periodic / closed NS.

Sources:
  grid     ana_grid.h:243-248 (Xsize=360 deg, Esize=20 deg, depth=4000)
           ana_grid.h:462-482 (spherical lon/lat), :677-689 (pm, pn),
           :870-876 (full Coriolis f = 2*Omega*sin(lat))
  initial  ana_initial.h:545-557 (T(z) exponential-tanh; S=35)
  wind     ana_winds.h:118-126 (zonal gaussian jet at 60S, 15 m/s);
           the full-physics path runs it through COARE BULK_FLUXES
           (make_bulk_forcing_fn), the light variant through a
           constant-Cd stress law (make_forcing_fn)
  params   roms_benchmark3.in (dt=150, ndtfast=20, theta_s=theta_b=0,
           Tcline=400, nonlinear EOS, quadratic drag rdrg2, VISC2=5000,
           TNU2=500, AKV_BAK=1e-4)

Full reference physics is available: vmix='lmd' (LMD-KPP), COARE bulk
fluxes via make_bulk_forcing_fn, MIX_GEO_TS rotated diffusion, nonlinear
EOS, quadratic drag.  The default config keeps vmix='constant' with the
analytic stress for pure-throughput benchmarking; switch on the full
physics with cfg.replace(mixing=...(vmix='lmd', solar_source=True)).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants
from ..config import (LBC, BoundaryConfig, BottomDragConfig, EOSConfig,
                      MixingConfig, ModelConfig, VerticalCoordConfig,
                      UPSTREAM3, CENTERED4)
from ..core.state import Forcing, State, initial_state
from ..grid.grid import Grid, build_grid


def make_config(Lm: int = 512, Mm: int = 64, N: int = 30,
                dt: float = 150.0, ndtfast: int = 20,
                dtype: str = "float32",
                full_physics: bool = False) -> ModelConfig:
    """full_physics=True selects the reference benchmark.h CPP set:
    LMD_MIXING (RIMIX+CONVEC+SKPP+NONLOCAL) + SOLAR_SOURCE; pair with
    make_bulk_forcing_fn for BULK_FLUXES+LONGWAVE+ALBEDO.  The default
    keeps the light constant-vmix variant for pure-throughput A/Bs."""
    lbc = LBC.ew_periodic()
    return ModelConfig(
        Lm=Lm, Mm=Mm, NT=2, NAT=2, dt=dt, ndtfast=ndtfast,
        vert=VerticalCoordConfig(N=N, Vtransform=2, Vstretching=4,
                                 theta_s=0.0, theta_b=0.0, Tcline=400.0),
        eos=EOSConfig(linear=False),
        mixing=MixingConfig(visc2=5000.0, tnu2=(500.0, 500.0),
                            akv_bak=1.0e-4, akt_bak=(1.0e-5, 1.0e-5),
                            vmix="lmd" if full_physics else "constant",
                            solar_source=full_physics,
                            mix_geo_ts=True,
                            splines_vdiff=True, splines_vvisc=True),
        drag=BottomDragConfig(kind="quadratic", rdrg2=3.0e-3),
        bc=BoundaryConfig.uniform(lbc),
        rho0=1025.0, gamma2=1.0,
        hadv=UPSTREAM3, vadv=CENTERED4,
        uv_hadv="up3", uv_vadv="c4_sw",
        uv_cor=True, uv_adv=True, curvgrid=True,
        dtype=dtype,
    )


def make_grid(cfg: ModelConfig) -> Grid:
    """Spherical channel grid (ana_grid.h BENCHMARK branches)."""
    Lm, Mm = cfg.Lm, cfg.Mm
    Mj, Li = cfg.shape2d
    Xsize, Esize, depth = 360.0, 20.0, 4000.0
    dx = Xsize / Lm                   # degrees lon
    dy = Esize / Mm                   # degrees lat
    Er = constants.Eradius
    d2r = constants.deg2rad

    i = np.arange(Li, dtype=np.float64)
    j = np.arange(Mj, dtype=np.float64)
    lonr = (dx * (i - 0.5))[None, :] + np.zeros((Mj, 1))
    latr = (-70.0 + dy * (j - 0.5))[:, None] + np.zeros((1, Li))

    # pm = 1/dx_m: ana_grid.h:681-689
    val1 = Lm / (2.0 * np.pi * Er)                    # per-degree factor /360
    val2 = Mm * 360.0 / (2.0 * np.pi * Er * Esize)
    pm = val1 / np.cos(latr * d2r) * np.ones_like(lonr)
    pn = val2 * np.ones_like(lonr)

    # full Coriolis (ana_grid.h:870-876)
    omega2 = 2.0 * (2.0 * np.pi * 366.25 / 365.25) / 86400.0
    f = omega2 * np.sin(latr * d2r)

    h = np.full((Mj, Li), depth)
    xr = Er * d2r * lonr * np.cos(latr * d2r)
    yr = Er * d2r * latr

    return build_grid(cfg, h=h, pm=pm, pn=pn, f=f, xr=xr, yr=yr,
                      spherical=True)


def make_initial(cfg: ModelConfig, grid: Grid) -> State:
    """ana_initial.h:545-557."""
    from ..grid.depth import set_depth
    zeta = jnp.zeros(cfg.shape2d, cfg.dtype)
    z_r, _, _ = set_depth(grid, zeta)
    g = constants.g
    val1 = (44.69 / 39.382) ** 2
    val2 = val1 * (cfg.rho0 * 800.0 / g) * (5.0e-5 / ((42.689 / 44.69) ** 2))
    T = val2 * jnp.exp(z_r / 800.0) * (0.6 - 0.4 * jnp.tanh(z_r / 800.0))
    S = jnp.full_like(T, 35.0)
    return initial_state(cfg, grid, zeta=zeta, t=jnp.stack([T, S]))


def make_atm_fn(cfg: ModelConfig, grid: Grid):
    """Analytical atmosphere for BULK_FLUXES: Gaussian zonal wind jet at
    60S (ana_winds.h:118-126), Tair=4 C (ana_tair.h:86-91), Pair=1025 mb
    (ana_pair.h:87-92), RH=0.8 (ana_humid.h:93-98), cloud=0.6
    (ana_cloud.h:116-117), Zillman shortwave with 6% water albedo and
    diurnal cycle (ana_srflux.h:165-192, ALBEDO)."""
    import math
    from ..core.bulk_flux import AtmState
    dtype = jnp.dtype(cfg.dtype)
    # positions from the grid's OWN coordinate fields so the factory
    # is shape-agnostic: called with the global grid it reproduces
    # ana_grid.h lat/lon; called with a per-shard BLOCK grid (inside
    # parallel.sharded_step's shard_map region) it yields block-local
    # forcing with no global arrays (bulk_flux.F per-tile semantics).
    # With a CONCRETE grid the static fields fold to numpy constants
    # exactly as before round 5 (identical HLO for the single-chip
    # step); the traced-array path only activates under shard_map.
    d2r = constants.deg2rad
    Er = constants.Eradius
    import jax as _jax
    traced = isinstance(grid.yr, _jax.core.Tracer)
    xp = jnp if traced else np
    yr = grid.yr if traced else np.asarray(grid.yr, np.float64)
    xr_ = grid.xr if traced else np.asarray(grid.xr, np.float64)
    lat = yr / (Er * d2r)
    lon = xr_ / (Er * d2r * xp.cos(lat * d2r))
    cffw = 0.2 * (60.0 + lat)
    Uwind = jnp.asarray(15.0 * xp.exp(-cffw * cffw), dtype)
    zeros = jnp.zeros_like(Uwind)
    Tair = jnp.full_like(Uwind, 4.0)
    Pair = jnp.full_like(Uwind, 1025.0)
    Hair = jnp.full_like(Uwind, 0.8)
    cloud = jnp.full_like(Uwind, 0.6)
    latr = jnp.asarray(lat * d2r, dtype)
    lonr = jnp.asarray(lon * d2r, dtype)
    Rsolar = 1353.0 / (cfg.rho0 * constants.Cp)
    alb_w = 0.06

    def atm(time):
        # day-of-year and hour from model clock (caldate equivalent for
        # an idealized year starting Jan 1)
        tdays = time * constants.sec2day
        yday = jnp.mod(tdays, 365.2425)
        hour = 24.0 * jnp.mod(tdays, 1.0)
        Dangle = (23.44 * jnp.cos((172.0 - yday) * 2.0 * math.pi
                                  / 365.2425)) * constants.deg2rad
        Hangle = (12.0 - hour) * math.pi / 12.0
        cff1 = jnp.sin(latr) * jnp.sin(Dangle)
        cff2 = jnp.cos(latr) * jnp.cos(Dangle)
        zenith = cff1 + cff2 * jnp.cos(Hangle - lonr)
        cffT = (0.7859 + 0.03477 * 4.0) / (1.0 + 0.00412 * 4.0)
        vap_p = (10.0 ** cffT) * 0.8
        srflx = jnp.where(
            zenith > 0.0,
            Rsolar * zenith * zenith * (1.0 - 0.6 * 0.6 ** 3)
            / ((zenith + 2.7) * vap_p * 1.0e-3 + 1.085 * zenith + 0.1),
            0.0) * (1.0 - alb_w)
        return AtmState(Uwind=Uwind, Vwind=zeros, Tair=Tair, Pair=Pair,
                        Hair=Hair, cloud=cloud, rain=zeros,
                        srflx=srflx.astype(dtype))

    return atm


def make_bulk_forcing_fn(cfg: ModelConfig, grid: Grid):
    """Full BULK_FLUXES forcing (benchmark.h) via COARE 3.0."""
    from ..core.bulk_flux import make_bulk_forcing
    return make_bulk_forcing(cfg, make_atm_fn(cfg, grid))


def make_forcing_fn(cfg: ModelConfig, grid: Grid):
    """Zonal wind jet (ana_winds.h:118-126) through a constant-Cd stress
    law — the cheap non-bulk variant used for pure throughput runs."""
    Mj, Li = cfg.shape2d
    dtype = jnp.dtype(cfg.dtype)
    lat_u = np.asarray(-70.0 + (20.0 / cfg.Mm)
                       * (np.arange(Mj) - 0.5))[:, None] + np.zeros((1, Li))
    cffw = 0.2 * (60.0 + lat_u)
    Uwind = 15.0 * np.exp(-cffw * cffw)
    rho_air, Cd = 1.2, 1.4e-3
    sustr_np = (rho_air * Cd * np.abs(Uwind) * Uwind / cfg.rho0)
    sustr0 = jnp.asarray(sustr_np, dtype)
    zeros = jnp.zeros((Mj, Li), dtype)
    zerosT = jnp.zeros((cfg.NT, Mj, Li), dtype)

    def forcing(time):
        return Forcing(sustr=sustr0, svstr=zeros, stflx=zerosT,
                       btflx=zerosT, srflx=zeros)

    return forcing
