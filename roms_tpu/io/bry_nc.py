"""Open-boundary data ingest from BRY NetCDF files
(get_data.F:102-426 boundary branch analog).

The reference reads per-edge boundary snapshots (BOUNDARY(ng)%zeta_west
etc.) from the BRYNAME file(s) every time the model clock passes a
record (get_data.F) and time-interpolates them in set_data.F.  Here all
records are loaded host-side once into TimeSeriesFields (io.forcing
machinery) and the interpolation happens inside the jitted step: the
returned obc_fn(time) produces the boundary-data pytree consumed by
core.obc / core.boundary:

    {"zeta": {side: (Mj|Li,)}, "ubar": ..., "vbar": ...,
     "u": {side: (N, Mj|Li)}, "v": ...,
     "t": {itrc: {side: (N, Mj|Li)}}}

File conventions follow the reference's varinfo registry: variables
named ``<var>_<edge>`` (zeta_west, temp_north, ...); each variable's
time axis resolved via its ``time`` attribute, then the standard names
(zeta_time / v2d_time / v3d_time / temp_time / salt_time / bry_time /
ocean_time); a ``cycle_length`` attribute on the time variable enables
climatological cycling (get_data.F cycle logic).  Standard ROMS edge
lines that are one point short (xi_u = Lm+1, eta_v = Mm+1) are padded
into this framework's uniform ghost layout.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from ..config import ModelConfig
from ._ncutil import native as _native, resolve_time, tracer_names \
    as _tracer_names
from .forcing import TimeSeriesField

EDGES = ("west", "east", "south", "north")

# time-variable name candidates per boundary variable (varinfo.yaml
# conventions; get_data.F resolves the same way via the registry)
_TIME_CANDIDATES = {
    "zeta": ("zeta_time",),
    "ubar": ("v2d_time",),
    "vbar": ("v2d_time",),
    "u": ("v3d_time",),
    "v": ("v3d_time",),
    "temp": ("temp_time",),
    "salt": ("salt_time",),
}
_FALLBACK_TIMES = ("bry_time", "ocean_time")


def _resolve_time(f, var, varname_base):
    cands = (list(_TIME_CANDIDATES.get(varname_base, ()))
             + list(_FALLBACK_TIMES))
    return resolve_time(f, var, cands)


def _pad_line(vals, want_len):
    """Pad a (T[,N],L-1) standard staggered edge line to L by
    replicating into the ghost slot (uniform-shape layout)."""
    if vals.shape[-1] == want_len - 1:
        vals = np.concatenate([vals[..., :1], vals], axis=-1)
    return vals


def load_bry_netcdf(paths, cfg: ModelConfig,
                    edges: Sequence[str] = EDGES) -> Dict:
    """Read every recognized ``<var>_<edge>`` variable from the BRY
    file(s) into TimeSeriesFields.  Returns
    {var: {edge: TimeSeriesField}} with var in zeta/ubar/vbar/u/v +
    tracer names.  Multiple files chain in time order (get_data.F
    multi-file inquiry)."""
    from scipy.io import netcdf_file
    if isinstance(paths, str):
        paths = [paths]
    Mj, Li = cfg.shape2d
    want = {"west": Mj, "east": Mj, "south": Li, "north": Li}
    varnames = ["zeta", "ubar", "vbar", "u", "v"] + _tracer_names(cfg)

    raw: Dict[str, Dict[str, list]] = {}
    for path in paths:
        f = netcdf_file(path, "r", mmap=False)
        for base in varnames:
            for edge in edges:
                vn = f"{base}_{edge}"
                if vn not in f.variables:
                    continue
                var = f.variables[vn]
                times, cycle = _resolve_time(f, var, base)
                vals = _pad_line(_native(var[:]).astype(np.float64),
                                 want[edge])
                raw.setdefault(base, {}).setdefault(edge, []).append(
                    (times, vals, cycle))
        f.close()

    out: Dict[str, Dict[str, TimeSeriesField]] = {}
    for base, sides in raw.items():
        out[base] = {}
        for edge, parts in sides.items():
            times = np.concatenate([p[0] for p in parts])
            vals = np.concatenate([p[1] for p in parts], axis=0)
            order = np.argsort(times)
            cycle = parts[0][2]
            out[base][edge] = TimeSeriesField(times[order], vals[order],
                                              cycle=cycle)
    return out


def make_bry_obc_fn(cfg: ModelConfig, fields: Dict,
                    base_obc_fn=None):
    """Build obc_fn(time) -> boundary-data pytree from the loaded
    TimeSeriesFields (set_data.F per-step time interpolation, executed
    inside the jitted step).  Tracer fields are regrouped under "t" by
    tracer index, the layout core.step3d_t consumes."""
    import jax.numpy as jnp
    tracers = _tracer_names(cfg)
    dtype = jnp.dtype(cfg.dtype)

    def obc_fn(time):
        data = dict(base_obc_fn(time)) if base_obc_fn else {}
        for var, sides in fields.items():
            if var in tracers:
                itrc = tracers.index(var)
                tslot = data.setdefault("t", {})
                dst = tslot.setdefault(itrc, {})
            else:
                dst = data.setdefault(var, {})
            for edge, tsf in sides.items():
                dst[edge] = tsf.at(time).astype(dtype)
        return data

    return obc_fn
