"""Suspended-sediment transport with bed exchange.

Round-1 scope of the reference sediment module
(ROMS/Nonlinear/Sediment/): suspended classes advected/diffused as
tracers by the 3D engine, plus the column processes implemented here —

  - settling (sed_settling.F; CFL-limited upwind in place of the
    reference's PPM reconstruction, upgrade scheduled),
  - deposition through the bottom interface into the bed,
  - resuspension (sed_fluxes.F:255-283):
        ero_flux = min( max(0, dt*Erate*(1-poro)*frac*(tau_w/tau_ce-1)),
                        bed_mass + settling_flux )
    with tau_w = |bottom stress| (rho0-kinematic),
  - single bed layer mass bookkeeping (sed_bed.F reduced to one layer).

Bedload (sed_bedload.F) and multi-layer stratigraphy follow in a later
round.  Sediment tracers occupy slots [NAT+offset, ...) of the tracer
stack.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..config import ModelConfig
from ..grid.grid import Grid
from ..ops import stencil as st


@dataclass(frozen=True)
class SedConfig:
    """Per-class parameters (sediment.in defaults for sand)."""
    nsed: int = 1
    offset: int = 0            # tracer index of first sed class - NAT
    Wsed: Tuple[float, ...] = (1.0,)       # settling velocity (mm/s)
    Erate: Tuple[float, ...] = (5.0e-5,)   # surface erosion (kg/m2/s)
    tau_ce: Tuple[float, ...] = (0.05,)    # critical erosion (N/m2)
    Srho: Tuple[float, ...] = (2650.0,)    # grain density (kg/m3)
    d50: Tuple[float, ...] = (2.0e-4,)     # median grain diameter (m)
    poros: float = 0.5


class SedState(NamedTuple):
    bed_mass: jnp.ndarray       # (nsed, Mj, Li) kg/m2


def initial_sed(cfg: ModelConfig, sed: SedConfig,
                bed_mass0: float = 1.0) -> SedState:
    shp = (sed.nsed,) + cfg.shape2d
    return SedState(bed_mass=jnp.full(shp, bed_mass0, cfg.dtype))


def sed_column(cfg: ModelConfig, sed: SedConfig, grid: Grid, t,
               sstate: SedState, Hz, bustr, bvstr):
    """Settling + bed exchange for all classes.

    t: tracer stack with sediment concentrations (kg/m3) in their slots.
    Returns (tracer increment stack, new SedState).
    """
    dt = cfg.dt
    nb = cfg.NAT + sed.offset
    rho0 = cfg.rho0

    # bottom stress magnitude at rho points (sed_fluxes.F:219-224), in
    # N/m2 (bustr is kinematic m2/s2)
    taux = 0.5 * (bustr + st.ip1(bustr))
    tauy = 0.5 * (bvstr + st.jp1(bvstr))
    tau_w = rho0 * jnp.sqrt(taux ** 2 + tauy ** 2)

    inc = jnp.zeros_like(t)
    new_bed = []
    for s in range(sed.nsed):
        c = jnp.maximum(t[nb + s], 0.0)
        w = sed.Wsed[s] * 1.0e-3 * dt          # m per step

        # settling: downward upwind flux through interfaces (kg/m2/step)
        dzlim = jnp.minimum(w, 0.9 * Hz)
        flux_int = dzlim[1:] * c[1:]           # through interior faces
        flux_bot = dzlim[0] * c[0]             # deposition to the bed
        zpad = jnp.zeros_like(c[:1])
        dflux = jnp.concatenate([flux_int, zpad], axis=0) - \
            jnp.concatenate([flux_bot[None], flux_int], axis=0)
        dc = dflux / Hz

        # resuspension from the bed (sed_fluxes.F:263-281)
        cff1 = (1.0 - sed.poros)
        ero = dt * sed.Erate[s] * cff1 * \
            jnp.maximum(0.0, tau_w / sed.tau_ce[s] - 1.0)
        ero = jnp.minimum(ero, sstate.bed_mass[s] + flux_bot)
        dc = dc.at[0].add(ero / Hz[0])

        inc = inc.at[nb + s].set(dc)
        new_bed.append(sstate.bed_mass[s] + flux_bot - ero)

    return inc, SedState(bed_mass=jnp.stack(new_bed))


def bedload_mpm(cfg: ModelConfig, sed: SedConfig, grid: Grid,
                bed_mass, bustr, bvstr, bedload_coeff: float = 0.1):
    """Meyer-Peter & Mueller (1948) bedload transport
    (sed_bedload.F:416-700, BEDLOAD_MPM + SLOPE_LESSER):

        Phi = 8 (theta - theta_c)^{3/2},  theta_c = 0.047,
        qbl = Phi * sqrt((s-1) g d50) * d50 * Srho     (kg/m/s)

    directed along the bottom stress, limited by the available bed
    mass, with upwind face fluxes whose divergence updates the bed.
    Returns (new bed_mass, bedldu, bedldv) with the face fluxes in
    kg/m/s for diagnostics.
    """
    dt = cfg.dt
    eps = 1.0e-14
    omn = 1.0 / (grid.pm * grid.pn)
    new_bed = []
    bedldu_all, bedldv_all = [], []
    for ised in range(sed.nsed):
        smgd = (sed.Srho[ised] / cfg.rho0 - 1.0) * cfg.g * 2.0e-4             if not hasattr(sed, "d50") else None
        d50 = getattr(sed, "d50", (2.0e-4,) * sed.nsed)[ised]             if hasattr(sed, "d50") else 2.0e-4
        smgd = (sed.Srho[ised] / cfg.rho0 - 1.0) * cfg.g * d50
        osmgd = 1.0 / smgd
        smgdr = jnp.sqrt(smgd) * d50 * sed.Srho[ised]

        # bottom stress magnitude/direction at rho points
        # (sed_bedload.F:337-360)
        bx = 0.5 * (bustr + st.ip1(bustr))
        be = 0.5 * (bvstr + st.jp1(bvstr))
        tau_w = jnp.sqrt(bx ** 2 + be ** 2)
        angleu = bx / (tau_w + eps)
        anglev = be / (tau_w + eps)

        bedld = 8.0 * jnp.maximum(tau_w * osmgd - 0.047, 0.0) ** 1.5             * smgdr
        FX_r = angleu * bedld * grid.on_r * dt
        FE_r = anglev * bedld * grid.om_r * dt

        # SLOPE_LESSER bed-slope modification (sed_bedload.F:521-534)
        sed_angle = jnp.tan(33.0 * jnp.pi / 180.0)
        c1x = 0.5 * (1.0 + jnp.sign(FX_r))
        dzdx = jnp.minimum(
            (st.ip1(grid.h) - grid.h) * grid.pm * c1x +
            (grid.h - st.im1(grid.h)) * grid.pm * (1.0 - c1x),
            0.52) * jnp.sign(FX_r)
        FX_r = FX_r * sed_angle / (jnp.cos(jnp.arctan(dzdx)) *
                                   (sed_angle - dzdx))
        c1e = 0.5 * (1.0 + jnp.sign(FE_r))
        dzdy = jnp.minimum(
            (st.jp1(grid.h) - grid.h) * grid.pn * c1e +
            (grid.h - st.jm1(grid.h)) * grid.pn * (1.0 - c1e),
            0.52) * jnp.sign(FE_r)
        FE_r = FE_r * sed_angle / (jnp.cos(jnp.arctan(dzdy)) *
                                   (sed_angle - dzdy))

        FX_r = FX_r * bedload_coeff
        FE_r = FE_r * bedload_coeff
        # availability limit (sed_bedload.F:543-556)
        tot = jnp.abs(FX_r) + jnp.abs(FE_r) + eps
        avail = bed_mass[ised] * omn
        FX_r = jnp.sign(FX_r) * jnp.minimum(
            jnp.abs(FX_r), avail * jnp.abs(FX_r) / tot)
        FE_r = jnp.sign(FE_r) * jnp.minimum(
            jnp.abs(FE_r), avail * jnp.abs(FE_r) / tot)

        # upwind face fluxes (sed_bedload.F:666-700)
        def face(Fm1, F0):
            c1 = 0.5 * (1.0 + jnp.sign(F0))
            c2 = 0.5 * (1.0 - jnp.sign(F0))
            avg = 0.5 * (Fm1 + F0)
            return (0.5 * (1.0 + jnp.sign(Fm1)) * (c1 * Fm1 + c2 * avg)
                    + 0.5 * (1.0 - jnp.sign(Fm1)) * (c2 * F0 + c1 * avg))

        FX = face(st.im1(FX_r), FX_r) * grid.umask
        FE = face(st.jm1(FE_r), FE_r) * grid.vmask
        dm = -(grid.pm * grid.pn) * (st.dx_p(FX) + st.dy_p(FE))
        new_bed.append(jnp.maximum(bed_mass[ised] + dm, 0.0))
        bedldu_all.append(FX / (grid.on_u * dt))
        bedldv_all.append(FE / (grid.om_v * dt))
    return (jnp.stack(new_bed), jnp.stack(bedldu_all),
            jnp.stack(bedldv_all))


def bedload_soulsby(cfg: ModelConfig, sed: SedConfig, grid: Grid,
                    bed_mass, tau_mean, tau_wav, phic, phicw,
                    theta_cr: float = 0.05, bedload_coeff: float = 0.1):
    """Soulsby & Damgaard (2005) wave-current bedload
    (sed_bedload.F:425-484, BEDLOAD_SOULSBY, w_asym = 0 as in the
    reference):

        theta_max from the wave/mean Shields vector sum,
        phi_x = max(12 sqrt(th_m)(th_m - th_cr),
                    12 (0.9534 + 0.1907 cos 2phi_cw) sqrt(th_w) th_m)
        phi_y = 12*0.1907 th_w^2 th_m sin(2phi_cw) /
                (th_w^1.5 + 1.5 th_m^1.5)

    rotated from the current direction phic into grid x/y.  tau_mean /
    tau_wav are kinematic stresses (m2/s2); phicw the wave-current
    angle.  Returns (new bed_mass, bedldu, bedldv)."""
    dt = cfg.dt
    eps = 1.0e-14
    omn = 1.0 / (grid.pm * grid.pn)
    new_bed, bu_all, bv_all = [], [], []
    for ised in range(sed.nsed):
        d50 = sed.d50[ised]
        smgd = (sed.Srho[ised] / cfg.rho0 - 1.0) * cfg.g * d50
        osmgd = 1.0 / smgd
        smgdr = jnp.sqrt(smgd) * d50 * sed.Srho[ised]

        th_w = tau_wav * osmgd + eps
        th_m = tau_mean * osmgd
        th_max1 = jnp.sqrt((th_m + th_w * jnp.cos(phicw)) ** 2
                           + (th_w * jnp.sin(phicw)) ** 2)
        th_max2 = jnp.sqrt((th_m + th_w * jnp.cos(phicw + jnp.pi)) ** 2
                           + (th_w * jnp.sin(phicw + jnp.pi)) ** 2)
        th_max = jnp.maximum(th_max1, th_max2)
        active = 0.5 * (1.0 + jnp.sign(th_max / theta_cr - 1.0))

        phi_x1 = 12.0 * jnp.sqrt(th_m) * \
            jnp.maximum(th_m - theta_cr, 0.0)
        phi_x2 = 12.0 * (0.9534 + 0.1907 * jnp.cos(2.0 * phicw)) * \
            jnp.sqrt(th_w) * th_m
        phi_x = jnp.where(jnp.abs(phi_x2) > phi_x1, phi_x2, phi_x1)
        bedld_x = phi_x * smgdr * active
        cff5 = th_w ** 1.5 + 1.5 * th_m ** 1.5
        phi_y = 12.0 * 0.1907 * th_w * th_w * \
            (th_m * jnp.sin(2.0 * phicw)) / cff5 * active
        bedld_y = phi_y * smgdr

        FX_r = (bedld_x * jnp.cos(phic) - bedld_y * jnp.sin(phic)) * \
            grid.on_r * dt * bedload_coeff
        FE_r = (bedld_x * jnp.sin(phic) + bedld_y * jnp.cos(phic)) * \
            grid.om_r * dt * bedload_coeff

        tot = jnp.abs(FX_r) + jnp.abs(FE_r) + eps
        avail = bed_mass[ised] * omn
        FX_r = jnp.sign(FX_r) * jnp.minimum(
            jnp.abs(FX_r), avail * jnp.abs(FX_r) / tot)
        FE_r = jnp.sign(FE_r) * jnp.minimum(
            jnp.abs(FE_r), avail * jnp.abs(FE_r) / tot)

        def face(Fm1, F0):
            c1 = 0.5 * (1.0 + jnp.sign(F0))
            c2 = 0.5 * (1.0 - jnp.sign(F0))
            avg = 0.5 * (Fm1 + F0)
            return (0.5 * (1.0 + jnp.sign(Fm1)) * (c1 * Fm1 + c2 * avg)
                    + 0.5 * (1.0 - jnp.sign(Fm1)) * (c2 * F0
                                                     + c1 * avg))

        FX = face(st.im1(FX_r), FX_r) * grid.umask
        FE = face(st.jm1(FE_r), FE_r) * grid.vmask
        dm = -(grid.pm * grid.pn) * (st.dx_p(FX) + st.dy_p(FE))
        new_bed.append(jnp.maximum(bed_mass[ised] + dm, 0.0))
        bu_all.append(FX / (grid.on_u * dt))
        bv_all.append(FE / (grid.om_v * dt))
    return (jnp.stack(new_bed), jnp.stack(bu_all), jnp.stack(bv_all))


def make_sed_hook(cfg: ModelConfig, sed: SedConfig, grid: Grid):
    def hook(t, sstate, Hz, bustr, bvstr):
        return sed_column(cfg, sed, grid, t, sstate, Hz, bustr, bvstr)
    return hook
