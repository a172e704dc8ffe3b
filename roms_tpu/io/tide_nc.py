"""Tide-harmonics file ingest (get_idata.F tidal branch analog).

The reference reads per-constituent elevation amplitude/phase and
current-ellipse fields once at initialization (ROMS/Nonlinear/
get_idata.F: tide_period, tide_Ephase, tide_Eamp, tide_Cphase,
tide_Cangle, tide_Cmax, tide_Cmin on the 2-D grid) and synthesizes
boundary tidal forcing every step in set_tides.F.  Here the file fields
are reduced host-side to the open-boundary edge lines and packed into
core.tides.TidalForcing, whose make_tidal_obc_fn already does the
per-step synthesis inside the jitted step.

Conventions: tide_period in hours (varinfo.yaml), phases in degrees;
the current ellipse (Cmax, Cmin, Cangle, Cphase) is converted to
per-component harmonic (amp, phase) pairs via

    u(t) = Cmax cosA cos(wt-P) - Cmin sinA sin(wt-P)
         = Ru cos(wt - (P - atan2(Cmin sinA, Cmax cosA)))
    v(t) = Cmax sinA cos(wt-P) + Cmin cosA sin(wt-P)
         = Rv cos(wt - (P + atan2(Cmin cosA, Cmax sinA)))

matching set_tides.F:25-116's trigonometric expansion.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..core.tides import TidalEdge, TidalForcing

EDGES = ("west", "east", "south", "north")
_D2R = np.pi / 180.0


def _native(a):
    a = np.asarray(a)
    return a.astype(a.dtype.newbyteorder("="))


def _edge_line(field2d, edge):
    """Extract the boundary ghost line of a (..., Mj, Li) field."""
    if edge == "west":
        return field2d[..., :, 0]
    if edge == "east":
        return field2d[..., :, -1]
    if edge == "south":
        return field2d[..., 0, :]
    if edge == "north":
        return field2d[..., -1, :]
    raise ValueError(edge)


def load_tide_netcdf(path: str, cfg: ModelConfig,
                     edges: Sequence[str] = EDGES,
                     ntc: int | None = None) -> TidalForcing:
    """Build a TidalForcing from a reference-layout tide file.

    edges: which open boundaries receive tidal data (per the deck's LBC
    rows; closed edges are simply skipped at synthesis).  ntc limits
    the constituent count (deck NTC; default all in the file).
    """
    from scipy.io import netcdf_file
    f = netcdf_file(path, "r", mmap=False)

    period_h = _native(f.variables["tide_period"][:]).astype(np.float64)
    nc = len(period_h) if ntc is None else min(ntc, len(period_h))
    period = period_h[:nc] * 3600.0      # hours -> seconds

    def get(name):
        if name not in f.variables:
            return None
        return _native(f.variables[name][:nc]).astype(np.float64)

    Eamp = get("tide_Eamp")
    Ephase = get("tide_Ephase")
    Cmax = get("tide_Cmax")
    Cmin = get("tide_Cmin")
    Cangle = get("tide_Cangle")
    Cphase = get("tide_Cphase")
    f.close()

    dtype = jnp.dtype(cfg.dtype)
    zeta = {}
    ubar = {}
    vbar = {}
    if Eamp is not None and Ephase is not None:
        for edge in edges:
            zeta[edge] = TidalEdge(
                amp=jnp.asarray(_edge_line(Eamp, edge), dtype),
                phase=jnp.asarray(_edge_line(Ephase, edge) * _D2R,
                                  dtype))
    if Cmax is not None:
        A = Cangle * _D2R
        P = Cphase * _D2R
        au, bu = Cmax * np.cos(A), Cmin * np.sin(A)
        av, bv = Cmax * np.sin(A), Cmin * np.cos(A)
        amp_u = np.hypot(au, bu)
        amp_v = np.hypot(av, bv)
        ph_u = P - np.arctan2(bu, np.where(amp_u > 0, au, 1.0))
        ph_v = P + np.arctan2(bv, np.where(amp_v > 0, av, 1.0))
        for edge in edges:
            ubar[edge] = TidalEdge(
                amp=jnp.asarray(_edge_line(amp_u, edge), dtype),
                phase=jnp.asarray(_edge_line(ph_u, edge), dtype))
            vbar[edge] = TidalEdge(
                amp=jnp.asarray(_edge_line(amp_v, edge), dtype),
                phase=jnp.asarray(_edge_line(ph_v, edge), dtype))

    return TidalForcing(period=jnp.asarray(period, dtype),
                        zeta=zeta, ubar=ubar, vbar=vbar)


def write_tide_netcdf(path: str, cfg: ModelConfig, *, period_hours,
                      Eamp=None, Ephase_deg=None, Cmax=None, Cmin=None,
                      Cangle_deg=None, Cphase_deg=None):
    """Export tide harmonics in the reference file layout (inverse of
    load_tide_netcdf; used for round-trip tests and to let analytic
    apps generate realistic tidal-forcing inputs)."""
    from scipy.io import netcdf_file
    Mj, Li = cfg.shape2d
    nc = len(period_hours)
    f = netcdf_file(path, "w", version=2)
    f.type = "ROMS tidal forcing file"
    f.createDimension("tide_period", nc)
    f.createDimension("eta_rho", Mj)
    f.createDimension("xi_rho", Li)
    vp = f.createVariable("tide_period", "d", ("tide_period",))
    vp.units = "hours"
    vp[:] = np.asarray(period_hours, np.float64)

    def put(name, arr, units):
        if arr is None:
            return
        v = f.createVariable(name, "d",
                             ("tide_period", "eta_rho", "xi_rho"))
        v.units = units
        v[:] = np.broadcast_to(np.asarray(arr, np.float64),
                               (nc, Mj, Li))

    put("tide_Eamp", Eamp, "meter")
    put("tide_Ephase", Ephase_deg, "degrees")
    put("tide_Cmax", Cmax, "meter second-1")
    put("tide_Cmin", Cmin, "meter second-1")
    put("tide_Cangle", Cangle_deg, "degrees")
    put("tide_Cphase", Cphase_deg, "degrees")
    f.flush()
    f.close()
