"""File-based forcing ingest and time interpolation.

The reference reads time-snapshot forcing from NetCDF (get_data.F) and
linearly interpolates to the model clock every step (set_data.F).  Here
snapshots are loaded host-side into device arrays once, and the
interpolation happens inside the jitted step as a pure function of the
model time — no per-step host I/O, no retracing.

Cyclic (climatological) time axes are supported like the reference's
cycle_length logic.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..core.state import Forcing


class TimeSeriesField:
    """A (T, ...) field with a time axis, interpolated under jit."""

    def __init__(self, times, values, cycle: Optional[float] = None):
        self.times = jnp.asarray(np.asarray(times, np.float64))
        self.values = jnp.asarray(values)
        self.cycle = cycle

    def at(self, time):
        t = time
        if self.cycle:
            t = jnp.mod(t, self.cycle)
        idx = jnp.clip(jnp.searchsorted(self.times, t) - 1, 0,
                       self.times.shape[0] - 2)
        t0 = self.times[idx]
        t1 = self.times[idx + 1]
        w = jnp.clip((t - t0) / (t1 - t0), 0.0, 1.0)
        return (1.0 - w) * self.values[idx] + w * self.values[idx + 1]


def load_forcing_netcdf(path: str, names: Dict[str, str],
                        time_name: str = "ocean_time",
                        cycle: Optional[float] = None):
    """Read forcing snapshots from a classic NetCDF file into
    TimeSeriesFields; names maps forcing slots ('sustr', 'svstr',
    'shflux', 'swrad', ...) to file variable names."""
    from scipy.io import netcdf_file
    f = netcdf_file(path, "r", mmap=False)
    # scipy returns big-endian views; force native-endian copies for jax
    times = np.ascontiguousarray(f.variables[time_name][:],
                                 dtype=np.float64)
    fields = {}
    for slot, var in names.items():
        vals = np.ascontiguousarray(f.variables[var][:], dtype=np.float64)
        fields[slot] = TimeSeriesField(times, vals, cycle=cycle)
    f.close()
    return fields


def load_forcing_multifile(paths, names, time_name: str = "ocean_time",
                           cycle=None):
    """Chain several forcing files into one TimeSeriesField per
    variable (get_data.F multi-file inquiry: records are concatenated
    in time order across the file list)."""
    import numpy as np
    merged = {}
    for path in paths:
        part = load_forcing_netcdf(path, names, time_name=time_name)
        for key, tsf in part.items():
            if key in merged:
                t0, v0 = merged[key]
                merged[key] = (np.concatenate([t0, np.asarray(tsf.times)]),
                               np.concatenate([v0, np.asarray(tsf.values)],
                                              axis=0))
            else:
                merged[key] = (np.asarray(tsf.times),
                               np.asarray(tsf.values))
    out = {}
    for key, (t, v) in merged.items():
        order = np.argsort(t)
        out[key] = TimeSeriesField(t[order], v[order], cycle=cycle)
    return out


# Recognized forcing-file variables and their standard time axes
# (varinfo.yaml conventions; get_data.F resolves through the registry).
FORCING_VARS = {
    "sustr": ("sms_time",), "svstr": ("sms_time",),
    "shflux": ("shf_time",), "swflux": ("swf_time",),
    "ssflux": ("ssf_time", "swf_time"),
    "swrad": ("srf_time",),
    "Uwind": ("wind_time",), "Vwind": ("wind_time",),
    "Tair": ("tair_time",), "Pair": ("pair_time",),
    "Qair": ("qair_time",), "cloud": ("cloud_time",),
    "rain": ("rain_time",),
    # surface wave fields (get_data.F WAVE_DATA branch; drive the
    # BBL closures and WEC when no wave model is coupled)
    "Hwave": ("wave_time",), "Dwave": ("wave_time",),
    "Lwave": ("wave_time",), "Pwave_top": ("wave_time",),
    "Pwave_bot": ("wave_time",), "Uwave_rms": ("wave_time",),
    # flux-correction data (QCORRECTION/SCORRECTION/SRELAXATION,
    # set_vbc.F:313-395)
    "SST": ("sst_time",), "dQdSST": ("sst_time",),
    "SSS": ("sss_time",),
}
_FRC_FALLBACK_TIMES = ("frc_time", "ocean_time", "time")


def load_forcing_auto(paths, cfg: ModelConfig) -> Dict[str,
                                                       TimeSeriesField]:
    """Scan forcing file(s) for every recognized variable (FORCING_VARS)
    and build TimeSeriesFields, resolving each variable's own time axis
    (its ``time`` attribute, then the standard names).  This is the
    FRCNAME deck path: multiple files chain in time order, mixed
    direct-flux and bulk-atmosphere variables are all collected."""
    from scipy.io import netcdf_file
    from ._ncutil import native, pad_to, resolve_time
    if isinstance(paths, str):
        paths = [paths]

    raw: Dict[str, list] = {}
    for path in paths:
        f = netcdf_file(path, "r", mmap=False)
        for name, cands in FORCING_VARS.items():
            if name not in f.variables:
                continue
            var = f.variables[name]
            times, cycle = resolve_time(
                f, var, tuple(cands) + _FRC_FALLBACK_TIMES)
            vals = pad_to(native(var[:]).astype(np.float64), cfg.shape2d)
            raw.setdefault(name, []).append((times, vals, cycle))
        f.close()

    out = {}
    for name, parts in raw.items():
        t = np.concatenate([p[0] for p in parts])
        v = np.concatenate([p[1] for p in parts], axis=0)
        order = np.argsort(t)
        out[name] = TimeSeriesField(t[order], v[order], cycle=parts[0][2])
    return out


def make_file_atm_fn(cfg: ModelConfig, fields: Dict[str,
                                                    TimeSeriesField]):
    """Build atm_fn(time) -> AtmState from file fields for the COARE
    bulk-flux path (the BULK_FLUXES branch of get_data.F: Uwind/Vwind/
    Tair/Pair/Qair/cloud/rain/swrad).  swrad in W/m2 is converted to
    the kinematic units bulk_flux consumes."""
    from .. import constants
    from ..core.bulk_flux import AtmState
    Mj, Li = cfg.shape2d
    dtype = jnp.dtype(cfg.dtype)
    zeros = jnp.zeros((Mj, Li), dtype)
    oHcp = 1.0 / (cfg.rho0 * constants.Cp)

    def get(name, default):
        fld = fields.get(name)
        return (lambda t: fld.at(t).astype(dtype)) if fld else \
            (lambda t: default)

    f_uw = get("Uwind", zeros)
    f_vw = get("Vwind", zeros)
    f_ta = get("Tair", jnp.full((Mj, Li), 10.0, dtype))
    f_pa = get("Pair", jnp.full((Mj, Li), 1013.0, dtype))
    f_qa = get("Qair", jnp.full((Mj, Li), 0.8, dtype))
    f_cl = get("cloud", zeros)
    f_rn = get("rain", zeros)
    f_sw = get("swrad", zeros)

    def atm(time):
        return AtmState(Uwind=f_uw(time), Vwind=f_vw(time),
                        Tair=f_ta(time), Pair=f_pa(time),
                        Hair=f_qa(time), cloud=f_cl(time),
                        rain=f_rn(time), srflx=f_sw(time) * oHcp)

    return atm


def has_bulk_atm(fields: Dict) -> bool:
    """True when the loaded forcing set drives the bulk-flux path
    (wind components present) rather than direct stress/flux."""
    return "Uwind" in fields or "Vwind" in fields


def make_file_forcing_fn(cfg: ModelConfig, fields: Dict[str,
                                                        TimeSeriesField]):
    """Build forcing(time) -> Forcing from TimeSeriesFields.  Heat and
    freshwater fluxes are converted to kinematic tracer fluxes:
    stflx[T] = shflux/(rho0*Cp), stflx[S] = ssflux (already m/s * S)."""
    from .. import constants
    Mj, Li = cfg.shape2d
    dtype = jnp.dtype(cfg.dtype)
    zeros = jnp.zeros((Mj, Li), dtype)

    def get(slot, default):
        fld = fields.get(slot)
        return (lambda t: fld.at(t).astype(dtype)) if fld else \
            (lambda t: default)

    f_sustr = get("sustr", zeros)
    f_svstr = get("svstr", zeros)
    f_shflux = get("shflux", zeros)
    f_ssflux = get("ssflux", zeros)
    if "ssflux" not in fields and "swflux" in fields:
        # E-P freshwater flux (m/s): stflx[S] = swflux * surface S
        # (set_vbc.F EMINUSP); surface salinity approximated by the
        # configured reference S0 in this time-only forcing closure.
        swf = fields["swflux"]
        S0 = cfg.eos.S0
        f_ssflux = lambda t: (swf.at(t) * S0).astype(dtype)
    f_swrad = get("swrad", zeros)
    oHcp = 1.0 / (cfg.rho0 * constants.Cp)

    def forcing(time):
        stT = f_shflux(time) * oHcp
        srf = f_swrad(time) * oHcp
        stS = f_ssflux(time)
        stflx = jnp.stack([stT, stS] + [zeros] * (cfg.NT - 2))
        return Forcing(sustr=f_sustr(time), svstr=f_svstr(time),
                       stflx=stflx, btflx=jnp.zeros_like(stflx),
                       srflx=srf)

    return forcing


def has_wave_fields(fields: Dict) -> bool:
    """True when the loaded forcing set carries surface wave data
    (FRCNAME wave branch of get_data.F)."""
    return "Hwave" in fields and "Dwave" in fields


def make_file_wave_fn(cfg: ModelConfig,
                      fields: Dict[str, TimeSeriesField],
                      kind: str = "bbl"):
    """wave_fn(time) from file fields.

    kind='bbl': returns (Hwave, Dwave, Pwave_bot) for the wave-current
    bottom boundary layer closures (mb/ssw/sg; Pwave_top is the
    fallback period).  kind='wec': returns (Hwave, Dwave, Lwave) for
    the vortex-force/Stokes coupling."""
    Mj, Li = cfg.shape2d
    dtype = jnp.dtype(cfg.dtype)

    def get(name, default, alt=None):
        fld = fields.get(name) or (fields.get(alt) if alt else None)
        dflt = jnp.full((Mj, Li), default, dtype)
        return (lambda t: fld.at(t).astype(dtype)) if fld else \
            (lambda t: dflt)

    f_h = get("Hwave", 0.0)
    f_d = get("Dwave", 0.0)
    if kind == "wec":
        f_3 = get("Lwave", 100.0)
    else:
        f_3 = get("Pwave_bot", 8.0, alt="Pwave_top")

    def wave(time):
        return f_h(time), f_d(time), f_3(time)

    return wave
