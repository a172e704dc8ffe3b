"""Shared helpers for reading reference-layout NetCDF inputs.

Used by the ingest modules (grid_nc, state_nc, bry_nc, clm_nc,
tide_nc, forcing): native-endian conversion for scipy's big-endian
classic-NetCDF views, time-axis resolution following the reference's
varinfo ``time`` attribute convention with cycle_length support
(get_data.F cycle logic), and ghost-padding of standard staggered
layouts (xi_u = Lm+1 / eta_v = Mm+1) up to this framework's uniform
(Mm+2, Lm+2) shape (grid/grid.py layout note).
"""

from __future__ import annotations

import numpy as np

SEC_PER_DAY = 86400.0


def native(a):
    a = np.asarray(a)
    return a.astype(a.dtype.newbyteorder("="))


def attr_str(var, name):
    raw = getattr(var, name, None)
    if raw is None:
        return None
    return raw.decode() if isinstance(raw, bytes) else str(raw)


def tracer_names(cfg):
    names = ["temp", "salt"]
    extra = list(getattr(cfg, "tracer_names", None) or ())
    for i in range(2, cfg.NT):
        j = i - 2
        names.append(extra[j] if j < len(extra)
                     else f"tracer{i + 1:02d}")
    return names[: cfg.NT]


def pad_to(a, shape2d):
    """Pad standard staggered arrays into the uniform full shape by
    replicating the first valid line into the ghost column/row."""
    Mj, Li = shape2d
    if a.shape[-1] == Li - 1:
        a = np.concatenate([a[..., :1], a], axis=-1)
    if a.shape[-2] == Mj - 1:
        a = np.concatenate([a[..., :1, :], a], axis=-2)
    return a


def resolve_time(f, var, candidates):
    """Find a variable's time axis: its ``time`` attribute first, then
    the candidate names.  Returns (times_seconds, cycle_seconds|None);
    day units are converted (varinfo 'time' entries are days since
    initialization in the reference's files)."""
    names = []
    att = attr_str(var, "time")
    if att:
        names.append(att.strip())
    names += [c for c in candidates if c]
    for nm in names:
        if nm in f.variables:
            tv = f.variables[nm]
            times = native(tv[:]).astype(np.float64)
            cycle = getattr(tv, "cycle_length", None)
            if cycle is not None:
                cycle = float(np.asarray(cycle))
            units = attr_str(tv, "units") or ""
            if units.startswith("day"):
                times = times * SEC_PER_DAY
                if cycle:
                    cycle *= SEC_PER_DAY
            return times, cycle
    raise ValueError(f"no time variable found (tried {names})")
