"""Output field metadata registry.

The JSON-like equivalent of the reference's ROMS/External/varinfo.yaml
(7951 lines) + mod_ncparam: every exportable field carries its I/O name,
long name, units and C-grid location.  Locations: r2/u2/v2 (2-D rho/u/v),
r3/u3/v3 (3-D at rho levels), w3 (3-D at w interfaces).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class VarInfo:
    name: str
    long_name: str
    units: str
    location: str
    time: bool = True


# Keyed by State attribute (or derived-field key).
REGISTRY = {
    "zeta": VarInfo("zeta", "free-surface", "meter", "r2"),
    # quicksave (QCK) surface slices (wrt_quick.F surface switches)
    "temp_sur": VarInfo("temp_sur", "surface temperature", "Celsius",
                        "r2"),
    "salt_sur": VarInfo("salt_sur", "surface salinity", "", "r2"),
    "u_sur": VarInfo("u_sur", "surface u-momentum", "meter second-1",
                     "u2"),
    "v_sur": VarInfo("v_sur", "surface v-momentum", "meter second-1",
                     "v2"),
    "ubar": VarInfo("ubar", "vertically integrated u-momentum component",
                    "meter second-1", "u2"),
    "vbar": VarInfo("vbar", "vertically integrated v-momentum component",
                    "meter second-1", "v2"),
    "u": VarInfo("u", "u-momentum component", "meter second-1", "u3"),
    "v": VarInfo("v", "v-momentum component", "meter second-1", "v3"),
    "temp": VarInfo("temp", "potential temperature", "Celsius", "r3"),
    "salt": VarInfo("salt", "salinity", "", "r3"),
    "rho": VarInfo("rho", "density anomaly", "kilogram meter-3", "r3"),
    "w": VarInfo("w", "vertical momentum component", "meter second-1",
                 "w3"),
    "omega": VarInfo("omega", "S-coordinate vertical momentum component",
                     "meter3 second-1", "w3"),
    "tke": VarInfo("tke", "turbulent kinetic energy", "meter2 second-2",
                   "w3"),
    "gls": VarInfo("gls", "generic length-scale", "meter3 second-2",
                   "w3"),
    "AKv": VarInfo("AKv", "vertical viscosity coefficient",
                   "meter2 second-1", "w3"),
    "AKt": VarInfo("AKt", "temperature vertical diffusion coefficient",
                   "meter2 second-1", "w3"),
    "hsbl": VarInfo("Hsbl", "depth of oceanic surface boundary layer",
                    "meter", "r2"),
    "sustr": VarInfo("sustr", "surface u-momentum stress",
                     "newton meter-2", "u2"),
    "svstr": VarInfo("svstr", "surface v-momentum stress",
                     "newton meter-2", "v2"),
    # static grid fields
    "h": VarInfo("h", "bathymetry at RHO-points", "meter", "r2",
                 time=False),
    "f": VarInfo("f", "Coriolis parameter at RHO-points", "second-1",
                 "r2", time=False),
    "pm": VarInfo("pm", "curvilinear coordinate metric in XI",
                  "meter-1", "r2", time=False),
    "pn": VarInfo("pn", "curvilinear coordinate metric in ETA",
                  "meter-1", "r2", time=False),
}

TRACER_NAMES = ("temp", "salt")


def dims_for(location: str, N: int):
    return {
        "r2": ("eta_rho", "xi_rho"),
        "u2": ("eta_u", "xi_u"),
        "v2": ("eta_v", "xi_v"),
        "r3": ("s_rho", "eta_rho", "xi_rho"),
        "u3": ("s_rho", "eta_u", "xi_u"),
        "v3": ("s_rho", "eta_v", "xi_v"),
        "w3": ("s_w", "eta_rho", "xi_rho"),
    }[location]
