"""Tidal boundary forcing from harmonic constants.

Re-implements the SSH_TIDES/UV_TIDES path of ROMS/Nonlinear/set_tides.F:
boundary elevation and barotropic currents synthesized from NTC
constituents,

    zeta_tide(t) = sum_k amp_k * cos(omega_k * t - phase_k)

and delivered through the open-boundary data dict consumed by
core.obc (Chapman zeta + Flather ubar/vbar), replacing the reference's
BOUNDARY(ng)%zeta_west etc. updates.  Body-force equilibrium tide
(TIDE_GENERATING_FORCES) arrives with the SAL milestone.
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


def make_tidal_obc_fn(tides: TidalForcing, base_obc_fn=None):
    """Build an obc_fn(time) that superposes tidal harmonics on any base
    boundary data."""

    def synth(edges: Dict[str, TidalEdge], time):
        out = {}
        omega = 2.0 * jnp.pi / tides.period
        for side, te in edges.items():
            phase = omega[:, None] * time - te.phase
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
