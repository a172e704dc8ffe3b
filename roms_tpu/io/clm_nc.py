"""Climatology ingest from CLM NetCDF files and nudging coefficients
(get_data.F climatology branch + get_nudgcoef.F analogs).

The reference reads climatology snapshots (CLIMA(ng)%tclm/uclm/...)
from CLMNAME when LtracerCLM/Lm3CLM/... are on, time-interpolates them
per step (set_data.F), and nudges the solution toward them with
coefficients either uniform (deck TNUDG/M3NUDG, days) or spatially
varying from the NUDNAME file (get_nudgcoef.F: M2_NudgeCoef,
M3_NudgeCoef, temp_NudgeCoef/tracer_NudgeCoef, units day-1).

Here the snapshots become TimeSeriesFields interpolated inside the
jitted step and the result feeds core.climatology.nudge_tracers /
nudge_momentum_rhs through the Model clm_fn(time) hook:

    clm_fn(time) -> {"tclm": (NT,N,Mj,Li), "Tnudgcof": ...,
                     "uclm"/"vclm": (N,Mj,Li), "M3nudgcof": ...}
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .forcing import TimeSeriesField

from ._ncutil import (SEC_PER_DAY as _SEC_PER_DAY, native as _native,
                      pad_to as _pad_to, resolve_time,
                      tracer_names as _tracer_names)

_TIME_CANDIDATES = ("clm_time", "ocean_time", "time", "month")


def _resolve_time(f, var):
    return resolve_time(f, var, _TIME_CANDIDATES)


def load_clm_netcdf(paths, cfg: ModelConfig) -> Dict[str,
                                                     TimeSeriesField]:
    """Read climatology snapshot fields (u, v, temp, salt + extra
    tracers; zeta/ubar/vbar accepted for SSH/M2 climatology consumers)
    into TimeSeriesFields keyed by variable name."""
    from scipy.io import netcdf_file
    if isinstance(paths, str):
        paths = [paths]
    varnames = (["zeta", "ubar", "vbar", "u", "v"] + _tracer_names(cfg))

    raw: Dict[str, list] = {}
    for path in paths:
        f = netcdf_file(path, "r", mmap=False)
        for base in varnames:
            if base not in f.variables:
                continue
            var = f.variables[base]
            times, cycle = _resolve_time(f, var)
            vals = _pad_to(_native(var[:]).astype(np.float64),
                           cfg.shape2d)
            raw.setdefault(base, []).append((times, vals, cycle))
        f.close()

    out = {}
    for base, parts in raw.items():
        times = np.concatenate([p[0] for p in parts])
        vals = np.concatenate([p[1] for p in parts], axis=0)
        order = np.argsort(times)
        out[base] = TimeSeriesField(times[order], vals[order],
                                    cycle=parts[0][2])
    return out


def load_nudgcoef_netcdf(path: str, cfg: ModelConfig) -> Dict:
    """get_nudgcoef.F analog: spatially-varying inverse time scales.
    File units are day-1 (varinfo.yaml); converted to s-1 here.
    Returns {"Tnudgcof": (Mj,Li) or (N,Mj,Li), "M3nudgcof": ...,
    "M2nudgcof": ...} for whichever variables exist."""
    from scipy.io import netcdf_file
    f = netcdf_file(path, "r", mmap=False)

    def get(*names):
        for nm in names:
            if nm in f.variables:
                return (_pad_to(_native(f.variables[nm][:]).astype(
                    np.float64), cfg.shape2d) / _SEC_PER_DAY)
        return None

    out = {}
    t = get("temp_NudgeCoef", "tracer_NudgeCoef")
    if t is not None:
        out["Tnudgcof"] = jnp.asarray(t, jnp.dtype(cfg.dtype))
    m3 = get("M3_NudgeCoef")
    if m3 is not None:
        out["M3nudgcof"] = jnp.asarray(m3, jnp.dtype(cfg.dtype))
    m2 = get("M2_NudgeCoef")
    if m2 is not None:
        out["M2nudgcof"] = jnp.asarray(m2, jnp.dtype(cfg.dtype))
    f.close()
    return out


def make_clm_fn(cfg: ModelConfig, fields: Dict[str, TimeSeriesField],
                tnudg_days: Optional[Sequence[float]] = None,
                m3nudg_days: float = 0.0,
                nudgcoef: Optional[Dict] = None,
                nudg=None):
    """Build clm_fn(time) for Model from loaded climatology fields.

    tnudg_days: per-tracer uniform nudging time scales (deck TNUDG,
    days; read_phypar.F semantics: coefficient = 1/(days*86400)).
    nudgcoef overrides the uniform values with spatially-varying fields
    from load_nudgcoef_netcdf.

    nudg: a config.NudgingConfig — when given it supplies the rates
    (already 1/s) AND the Lnudge*CLM gates: tracers with
    lnudge_tclm[i] False get coefficient 0, momentum climatology is
    processed only when lnudge_m3clm/lnudge_m2clm (read_phypar.F
    LnudgeTCLM/LnudgeM3CLM/LnudgeM2CLM semantics).
    """
    dtype = jnp.dtype(cfg.dtype)
    tracers = _tracer_names(cfg)
    have_t = [nm for nm in tracers if nm in fields]
    have_m3 = "u" in fields and "v" in fields
    have_m2 = "ubar" in fields and "vbar" in fields
    if nudg is not None:
        if not any(nudg.lnudge_tclm):
            have_t = []
        have_m3 = have_m3 and nudg.lnudge_m3clm
        have_m2 = have_m2 and nudg.lnudge_m2clm
    else:
        have_m2 = False
    if not have_t and not have_m3 and not have_m2:
        return None

    if nudgcoef and "Tnudgcof" in nudgcoef:
        Tcof = nudgcoef["Tnudgcof"]
    elif nudg is not None and nudg.tnudg:
        rates = list(nudg.tnudg) + [nudg.tnudg[-1]] * cfg.NT
        gates = list(nudg.lnudge_tclm) + [False] * cfg.NT
        inv = [r if gates[i] else 0.0
               for i, r in enumerate(rates[:cfg.NT])]
        Tcof = jnp.asarray(inv, dtype)[:, None, None, None]
    elif tnudg_days:
        days = list(tnudg_days) + [tnudg_days[-1]] * cfg.NT
        inv = [1.0 / (d * _SEC_PER_DAY) if d > 0 else 0.0
               for d in days[:cfg.NT]]
        # per-tracer scalar coefficients broadcast as (NT,1,1,1)
        Tcof = jnp.asarray(inv, dtype)[:, None, None, None]
    else:
        Tcof = jnp.zeros((), dtype)

    if nudgcoef and "M3nudgcof" in nudgcoef:
        M3cof = nudgcoef["M3nudgcof"]
    elif nudg is not None:
        M3cof = jnp.asarray(nudg.m3nudg, dtype)
    else:
        M3cof = jnp.asarray(
            1.0 / (m3nudg_days * _SEC_PER_DAY) if m3nudg_days > 0
            else 0.0, dtype)

    if nudgcoef and "M2nudgcof" in nudgcoef:
        M2cof = nudgcoef["M2nudgcof"]
    else:
        M2cof = jnp.asarray(nudg.m2nudg if nudg is not None else 0.0,
                            dtype)

    zeros3 = jnp.zeros((cfg.N,) + cfg.shape2d, dtype)

    def clm_fn(time):
        clm = {}
        if have_t:
            tclm = []
            for nm in tracers:
                tsf = fields.get(nm)
                tclm.append(tsf.at(time).astype(dtype) if tsf is not None
                            else zeros3)
            clm["tclm"] = jnp.stack(tclm)
            clm["Tnudgcof"] = Tcof
        if have_m3:
            clm["uclm"] = fields["u"].at(time).astype(dtype)
            clm["vclm"] = fields["v"].at(time).astype(dtype)
            clm["M3nudgcof"] = M3cof
        if have_m2:
            clm["ubarclm"] = fields["ubar"].at(time).astype(dtype)
            clm["vbarclm"] = fields["vbar"].at(time).astype(dtype)
            clm["M2nudgcof"] = M2cof
        return clm

    return clm_fn
