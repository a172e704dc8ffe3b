"""Tidal boundary forcing from harmonic constants.

Re-implements the SSH_TIDES/UV_TIDES path of ROMS/Nonlinear/set_tides.F:
boundary elevation and barotropic currents synthesized from NTC
constituents,

    zeta_tide(t) = sum_k amp_k * cos(omega_k * t - phase_k)

and delivered through the open-boundary data dict consumed by
core.obc (Chapman zeta + Flather ubar/vbar), replacing the reference's
BOUNDARY(ng)%zeta_west etc. updates.  The body-force equilibrium tide
(TIDE_GENERATING_FORCES, equilibrium_tide.F) is implemented below
(harmonic_constituents + make_eq_tide_fn); per-constituent harmonics
from a tide NetCDF file load via io.tide_nc (get_idata.F analog).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np


class TidalEdge(NamedTuple):
    """Harmonics for one variable on one edge: arrays (NTC, L_edge)."""
    amp: jnp.ndarray
    phase: jnp.ndarray     # radians


class TidalForcing(NamedTuple):
    period: jnp.ndarray                    # (NTC,) seconds
    zeta: Dict[str, TidalEdge]
    ubar: Dict[str, TidalEdge]
    vbar: Dict[str, TidalEdge]


# Principal constituent periods (hours) — mod_tides.F conventions.
PERIODS_H = {"M2": 12.4206012, "S2": 12.0, "N2": 12.65834751,
             "K2": 11.96723606, "K1": 23.93447213, "O1": 25.81933871,
             "P1": 24.06588766, "Q1": 26.868350}


def make_tidal_obc_fn(tides: TidalForcing, base_obc_fn=None,
                      tide_start_days: float = 0.0):
    """Build an obc_fn(time) that superposes tidal harmonics on any base
    boundary data.

    tide_start_days: deck TIDE_START — the harmonic phases reference
    time-origin offset in days (set_tides.F:261:
    omega*(time - tide_start*day2sec))."""
    t0 = tide_start_days * 86400.0

    def synth(edges: Dict[str, TidalEdge], time):
        out = {}
        omega = 2.0 * jnp.pi / tides.period
        for side, te in edges.items():
            phase = omega[:, None] * (time - t0) - te.phase
            out[side] = jnp.sum(te.amp * jnp.cos(phase), axis=0)
        return out

    def obc(time):
        base = base_obc_fn(time) if base_obc_fn else {}
        data = dict(base)
        for var, edges in (("zeta", tides.zeta), ("ubar", tides.ubar),
                           ("vbar", tides.vbar)):
            if not edges:
                continue
            cur = dict(data.get(var, {}))
            syn = synth(edges, time)
            for side, val in syn.items():
                cur[side] = cur.get(side, 0.0) + val
            data[var] = cur
        return data

    return obc


# ---------------------------------------------------------------------------
# Equilibrium (body force) tide — TIDE_GENERATING_FORCES
# ---------------------------------------------------------------------------

def harmonic_constituents(days_since_astro_ref: float = 46074.0,
                          lnodal: bool = True):
    """Doodson & Warburg (1941) harmonic constants of the 7 major
    constituents (equilibrium_tide.F:270-420).

    days_since_astro_ref: tide_start expressed as days since the
    astronomical reference 1900-01-01 (datenum difference); the default
    corresponds roughly to the 2026 epoch.  Returns a dict
    name -> (Afl, chi_plus_nu_deg, omega, species) computed host-side
    (static under jit).
    """
    import numpy as _np
    deg2rad = _np.pi / 180.0
    T = days_since_astro_ref / 36524.25
    sm = 218.316 + 481267.8812 * T        # mean longitude of moon
    hs = 280.466 + 36000.7698 * T         # mean longitude of sun
    pp = 83.353 + 4069.0137 * T           # lunar perigee
    Nn = (-234.955 - 1934.1363 * T) * deg2rad   # lunar node

    if lnodal:
        fO1 = 1.009 + 0.187 * _np.cos(Nn) - 0.015 * _np.cos(2 * Nn)
        fK1 = 1.006 + 0.115 * _np.cos(Nn) - 0.009 * _np.cos(2 * Nn)
        fM2 = 1.0 - 0.037 * _np.cos(Nn)
        fS2 = 1.0
        fK2 = 1.024 + 0.286 * _np.cos(Nn) + 0.008 * _np.cos(2 * Nn)
        nO1 = 10.8 * _np.sin(Nn) - 1.3 * _np.sin(2 * Nn)
        nK1 = -8.9 * _np.sin(Nn) + 0.7 * _np.sin(2 * Nn)
        nM2 = -2.1 * _np.sin(Nn)
        nS2 = 0.0
        nK2 = -17.7 * _np.sin(Nn) + 0.7 * _np.sin(2 * Nn)
    else:
        fO1 = fK1 = fM2 = fS2 = fK2 = 1.0
        nO1 = nK1 = nM2 = nS2 = nK2 = 0.0

    # name: (amp m, love, f, nu deg, chi deg, omega 1/s, species)
    table = {
        "Q1": (1.9273e-2, 0.695, fO1, nO1,
               hs - 3 * sm + pp - 90.0, 0.6495854e-4, 1),
        "O1": (10.0661e-2, 0.695, fO1, nO1,
               hs - 2 * sm - 90.0, 0.6759774e-4, 1),
        "K1": (14.1565e-2, 0.736, fK1, nK1,
               hs + 90.0, 0.7292117e-4, 1),
        "N2": (4.6397e-2, 0.693, fM2, nM2,
               2 * hs - 3 * sm + pp, 1.378797e-4, 2),
        "M2": (24.2334e-2, 0.693, fM2, nM2,
               2 * hs - 2 * sm, 1.405189e-4, 2),
        "S2": (11.2743e-2, 0.693, fS2, nS2,
               0.0, 1.454441e-4, 2),
        "K2": (3.0684e-2, 0.693, fK2, nK2,
               2 * hs, 1.458423e-4, 2),
    }
    return {k: (amp * f * love, chi + nu, omega, sp)
            for k, (amp, love, f, nu, chi, omega, sp) in table.items()}


def make_eq_tide_fn(lonr, latr, constituents=None):
    """Equilibrium tide synthesis eq_tide(time) in meters
    (equilibrium_tide.F:184-211): diurnal constituents scale with
    sin(2*lat), semidiurnal with cos^2(lat); phase advances with
    species*longitude.  lonr/latr in degrees at rho points."""
    if constituents is None:
        constituents = harmonic_constituents()
    deg2rad = jnp.pi / 180.0
    lon = lonr
    lat = latr * deg2rad
    sin2lat = jnp.sin(2.0 * lat)
    cos2lat = jnp.cos(lat) ** 2

    def eq_tide(time):
        out = 0.0
        for name, (Afl, chinu, omega, species) in constituents.items():
            shape = sin2lat if species == 1 else cos2lat
            out = out + Afl * shape * jnp.cos(
                omega * time + deg2rad * (species * lon + chinu))
        return out
    return eq_tide
