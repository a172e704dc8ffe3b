"""Oyster-larvae biology on floats (planktonic behavior model).

Re-implements the reference's biology-floats coupling
(ROMS/Nonlinear/Biology/oyster_floats.h:160-458, Dekshenieks et al.
1993-1997; Narvaez et al. 2012) as vectorized per-float pytree updates:

    d(size)/dt = Grate(food, size) * Gfactor(salt, temp) * turb_ef
    swim_frac  += dsalt * slope_Sinc/Sdec, clipped to [Tmin, Tmax]
    w_bio      = swim_frac * SwimRate(size, temp)
                 - (1 - swim_frac) * sink(size)

with the three empirical look-up tables (growth rate vs food x size,
growth factor vs salinity x temperature, swimming speed vs size x
temperature) interpolated bilinearly, exactly as the Fortran
(oyster_floats.h:265-288, 300-320, 367-390).  Larvae reaching
settle_size settle: size freezes and vertical behavior stops
(oyster_floats.h:410-436).

The reference integrates larval size with the float predictor/
corrector time levels (track(isizf,:,:) AB/AM weights); the
rotating-time-level machinery reduces here to a forward update of the
instantaneous growth rate within the model's single baroclinic step —
the same dataflow reduction the main stepping applies to the
kstp/krhs/knew slots.

Parameters and table data mirror `ROMS/External/behavior_oyster.in`;
`load_behavior_deck` parses that file directly."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants
from ..config import ModelConfig
from ..grid.grid import Grid
from . import floats as fl


@dataclass(frozen=True)
class OysterConfig:
    """behavior_oyster.in scalar defaults."""
    Larvae_size0: float = 50.0      # um
    Larvae_GR0: float = 12.5        # um/day growth below turb_size
    settle_size: float = 330.0      # um
    food_supply: float = 4.0        # mg C / l (constant ambient)
    turb_ambi: float = 0.0          # g/l ambient turbidity
    turb_crit: float = 0.1
    turb_slop: float = 0.5
    turb_axis: float = 1.0
    turb_base: float = 0.375
    turb_rate: float = 0.5
    turb_mean: float = 2.0
    turb_size: float = 75.0         # um below which GR0 applies
    swim_Tmin: float = 0.64
    swim_Tmax: float = 0.83
    slope_Sinc: float = 0.0622
    slope_Sdec: float = 0.0668
    sink_base: float = 2.665        # mm/s
    sink_rate: float = 0.0058       # 1/um
    sink_size: float = 220.0        # um


class Table2D(NamedTuple):
    """Regular-grid look-up table: value(i_axis, j_axis)."""
    x0: float                       # I-axis start
    dx: float                       # I-axis increment
    y0: float                       # J-axis start
    dy: float                       # J-axis increment
    data: jnp.ndarray               # (Im, Jm)


def table_interp(tb: Table2D, x, y):
    """Bilinear table interpolation with clamped extrapolation
    (oyster_floats.h:265-288 bounding of food/size to table range)."""
    Im, Jm = tb.data.shape
    xi = jnp.clip((x - tb.x0) / tb.dx, 0.0, Im - 1.0)
    yj = jnp.clip((y - tb.y0) / tb.dy, 0.0, Jm - 1.0)
    i0 = jnp.clip(jnp.floor(xi).astype(jnp.int32), 0, Im - 2)
    j0 = jnp.clip(jnp.floor(yj).astype(jnp.int32), 0, Jm - 2)
    p = xi - i0
    q = yj - j0
    d = tb.data
    return ((1 - p) * (1 - q) * d[i0, j0] + p * (1 - q) * d[i0 + 1, j0]
            + (1 - p) * q * d[i0, j0 + 1] + p * q * d[i0 + 1, j0 + 1])


class OysterTables(NamedTuple):
    grate: Table2D                  # food (mg C/l) x size (um) -> um/day
    gfactor: Table2D                # salt x temp -> nondimensional
    swim: Table2D                   # size (um) x temp -> mm/s


def default_tables() -> OysterTables:
    """Smooth analytical surrogates with the published qualitative
    shapes (Dekshenieks et al. 1993 Figs. 2-4): growth saturating in
    food and declining with size; growth factor peaked near T=25 C,
    S=22; swimming speed rising with size and temperature.  Axis
    ranges match behavior_oyster.in."""
    f = np.linspace(0.5, 8.0, 31)           # food, Grate_F0/DF
    L = np.linspace(50.0, 560.0, 52)        # size axis
    grate = (25.0 * f[:, None] / (1.0 + f[:, None])
             * np.exp(-((L[None, :] - 120.0) / 300.0) ** 2))
    S = np.linspace(2.5, 37.5, 15)
    T = np.linspace(7.0, 30.0, 24)
    gfac = (np.exp(-((S[:, None] - 22.0) / 10.0) ** 2)
            * np.exp(-((T[None, :] - 25.0) / 7.0) ** 2))
    Ls = np.linspace(50.0, 335.0, 58)
    Ts = np.linspace(7.0, 30.0, 24)
    swim = (0.5 * (Ls[:, None] / 335.0)
            * (0.3 + 0.7 * (Ts[None, :] - 7.0) / 23.0))
    return OysterTables(
        grate=Table2D(0.5, f[1] - f[0], 50.0, L[1] - L[0],
                      jnp.asarray(grate)),
        gfactor=Table2D(2.5, S[1] - S[0], 7.0, T[1] - T[0],
                        jnp.asarray(gfac)),
        swim=Table2D(50.0, Ls[1] - Ls[0], 7.0, Ts[1] - Ts[0],
                     jnp.asarray(swim)))


def load_behavior_deck(path: str) -> Tuple[OysterConfig, OysterTables]:
    """Parse a reference behavior_oyster.in: `key == value` scalars and
    the three bare-number table blocks following their `*_table =`
    marker lines (rows are J-axis levels of table(1:Im, 1:Jm))."""
    scalars = {}
    tables = {}
    cur = None
    rows = []
    with open(path) as f:
        for raw in f:
            line = raw.split("!")[0].rstrip()
            if not line.strip():
                continue
            if "_table" in line and "=" in line:
                if cur and rows:
                    tables[cur] = np.asarray(rows)
                cur = line.split("=")[0].strip()
                rows = []
                continue
            if "=" in line:
                # `key == value` (deck keywords) and `key = value`
                # (table-axis scalars) both carry one leading number
                k, v = line.replace("==", "=").split("=", 1)
                try:
                    scalars[k.strip()] = float(
                        v.strip().split()[0].replace("d", "e"))
                except (ValueError, IndexError):
                    pass
                continue
            parts = line.split()
            if cur and all(_isnum(p) for p in parts):
                rows.append([float(p.replace("d", "e")) for p in parts])
    if cur and rows:
        tables[cur] = np.asarray(rows)

    oc = OysterConfig(**{k: v for k, v in scalars.items()
                         if k in OysterConfig.__dataclass_fields__})

    def tb(name, x0k, dxk, y0k, dyk):
        data = tables[name].T           # rows are J levels -> (Im, Jm)
        return Table2D(scalars[x0k], scalars[dxk],
                       scalars[y0k], scalars[dyk], jnp.asarray(data))

    tbs = OysterTables(
        grate=tb("Grate_table", "Grate_F0", "Grate_DF",
                 "Grate_L0", "Grate_DL"),
        gfactor=tb("Gfactor_table", "Gfactor_S0", "Gfactor_DS",
                   "Gfactor_T0", "Gfactor_DT"),
        swim=tb("swim_table", "swim_L0", "swim_DL",
                "swim_T0", "swim_DT"))
    return oc, tbs


def _isnum(s):
    try:
        float(s.replace("d", "e"))
        return True
    except ValueError:
        return False


class OysterState(NamedTuple):
    size: jnp.ndarray               # (Nf,) larval length (um)
    swim_frac: jnp.ndarray          # (Nf,) fraction of time swimming
    salt_prev: jnp.ndarray          # (Nf,) salinity at previous step
    settled: jnp.ndarray            # (Nf,) bool


def initial_oyster(oc: OysterConfig, nfloats: int,
                   dtype=jnp.float64) -> OysterState:
    return OysterState(
        size=jnp.full((nfloats,), oc.Larvae_size0, dtype),
        swim_frac=jnp.full((nfloats,),
                           0.5 * (oc.swim_Tmin + oc.swim_Tmax), dtype),
        salt_prev=jnp.zeros((nfloats,), dtype),
        settled=jnp.zeros((nfloats,), bool))


def oyster_step(cfg: ModelConfig, oc: OysterConfig, tb: OysterTables,
                ost: OysterState, flt: fl.Floats, t, sc_r,
                first: bool = False):
    """One behavior update; returns (OysterState', w_bio (Nf,) m/s).

    t: (NT, N, Mj, Li) tracers; temperature/salinity are sampled at the
    float positions (track(ifTvar(...)) analog)."""
    sc_r = jnp.asarray(sc_r)
    temp = fl._interp3(t[0], flt.x, flt.y, flt.s, sc_r)
    salt = fl._interp3(t[1], flt.x, flt.y, flt.s, sc_r)
    salt_prev = jnp.where(first, salt, ost.salt_prev)
    dsalt = salt - salt_prev
    dsalt = jnp.where(jnp.abs(dsalt) < 1.0e-5, 0.0, dsalt)

    # growth (um/day): Grate(food, size) * Gfactor(salt, temp) * turb
    Grate = table_interp(tb.grate, oc.food_supply, ost.size)
    Gfactor = jnp.where(
        temp < tb.gfactor.y0, 0.0,
        table_interp(tb.gfactor, salt, temp))
    turb_ef = jnp.where(
        oc.turb_ambi > oc.turb_crit,
        oc.turb_base * jnp.exp(-oc.turb_rate
                               * (oc.turb_ambi - oc.turb_mean)),
        oc.turb_slop * oc.turb_ambi + oc.turb_axis)
    gr = jnp.where(ost.size > oc.turb_size,
                   Grate * Gfactor * turb_ef,
                   oc.Larvae_GR0 * Gfactor)       # um/day
    size = ost.size + cfg.dt * gr * constants.sec2day

    # swimming-time fraction responds to the salinity tendency
    # (oyster_floats.h:352-359)
    swim_frac = jnp.where(
        dsalt > 0.0,
        jnp.minimum(ost.swim_frac + dsalt * oc.slope_Sinc,
                    oc.swim_Tmax),
        jnp.maximum(ost.swim_frac + dsalt * oc.slope_Sdec,
                    oc.swim_Tmin))

    # swimming rate (mm/s) and sinking (mm/s); w_bio uses the
    # pre-update swimming fraction (oyster_floats.h:404 SwimTime)
    SwimRate = jnp.where(
        (temp < tb.swim.y0) | (size < tb.swim.x0), 0.0,
        table_interp(tb.swim, size, temp)) * 1.0e-3
    sink = oc.sink_base * jnp.exp(oc.sink_rate
                                  * (size - oc.sink_size)) * 1.0e-3
    w_bio = ost.swim_frac * SwimRate - (1.0 - ost.swim_frac) * sink

    # settlement (oyster_floats.h:410-436): freeze size and behavior
    settled = ost.settled | (size >= oc.settle_size)
    size = jnp.where(settled, ost.size, size)
    w_bio = jnp.where(settled, 0.0, w_bio)
    w_bio = jnp.where(flt.bounded, w_bio, 0.0)
    return (OysterState(size=size, swim_frac=swim_frac,
                        salt_prev=salt, settled=settled), w_bio)
