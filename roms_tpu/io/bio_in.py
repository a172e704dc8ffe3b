"""BPARNAM biology parameter-file readers.

The reference reads a separate keyword file per ecosystem model
(inp_par.F:168-539 chains read_BioPar from the model's *_inp.h, e.g.
ROMS/Nonlinear/Biology/fennel_inp.h) selected at compile time.  Here
the model is DETECTED from the deck's distinctive keywords, the
matching config dataclass is filled by field-name intersection, and
the Model bio_fn hook plus the tracer-block metadata (count, names,
BioIni values) are returned for the driver to wire up.

Supported decks (ROMS/External/*.in): bio_Fennel, npzd_Powell,
npzd_Franks, npzd_iron, nemuro, hypoxia_srm, red_tide.  The EcoSim
deck's array-valued spectral parameters need the dedicated
EcoSimFullConfig path (core/biology.py) and are refused with a clear
error.
"""

from __future__ import annotations

import dataclasses
import re
from typing import NamedTuple, Optional

from .roms_in import parse_roms_in


class BioDeck(NamedTuple):
    model: str                 # 'fennel', 'npzd_powell', ...
    config: object             # the filled config dataclass (or None)
    nbio: int                  # biological tracers after NAT
    names: tuple               # reference idbio names, in slot order
    bio_ini: dict              # {slot_index: initial value} from BioIni
    make_hook: object          # make_hook(cfg, grid) -> bio_fn


# reference idbio slot names in THIS package's tracer order
_SLOTS = {
    "fennel": ("iNO3_", "iNH4_", "iChlo", "iPhyt", "iZoop", "iLDeN",
               "iSDeN"),
    "fennel_carbon": ("iLDeC", "iSDeC", "iTIC_", "iTAlk"),
    "npzd_powell": ("iNO3_", "iPhyt", "iZoop", "iSDet"),
    "npzd_franks": ("iNO3_", "iPhyt", "iZoop", "iSDet"),
    "npzd_iron": ("iNO3_", "iPhyt", "iZoop", "iSDet", "iFdis",
                  "iFphy"),
    "nemuro": ("iSphy", "iLphy", "iSzoo", "iLzoo", "iPzoo", "iNO3_",
               "iNH4_", "iPON_", "iDON_", "iSiOH", "iopal"),
    "hypoxia_srm": ("iOxyg",),
    "red_tide": ("iDino",),
}


def detect_bio_model(params: dict) -> str:
    """Identify the ecosystem model from its distinctive keywords."""
    keys = set(params)
    if "Chl2C_m" in keys or "ChlMin" in keys:
        return "fennel"
    if any(k.startswith("HsGRZ") or k == "AlphaPS" for k in keys):
        return "nemuro"
    if "ResRate" in keys:
        return "hypoxia_srm"
    if "Gmax" in keys and "Dg" in keys:
        return "red_tide"
    if any("iFdis" in k or "iFphy" in k for k in keys) or \
            "T_Fe" in keys or "K_FeC" in keys:
        return "npzd_iron"
    if "ZooGA" in keys or "ZooEC" in keys:
        return "npzd_franks"
    if "PARfrac" in keys or "AttSW" in keys or "Vm_NO3" in keys:
        return "npzd_powell"
    if any(k in keys for k in ("NBands", "PhyCN_max", "HsDOP")):
        raise ValueError(
            "EcoSim decks carry array-valued spectral parameters; "
            "build the hook directly with core.biology."
            "EcoSimFullConfig/make_ecosim_full_hook")
    raise ValueError(
        f"cannot identify the biology model from BPARNAM keywords "
        f"(saw {sorted(keys)[:12]}...)")


def _fill(dc_cls, params: dict):
    """Fill a config dataclass from matching deck keywords (multi-grid
    plural values take the first entry, like read_BioPar Ngrids=1)."""
    kw = {}
    for f in dataclasses.fields(dc_cls):
        if f.name in params:
            v = params[f.name]
            if isinstance(v, list):
                v = v[0]
            if isinstance(v, (int, float, bool)):
                kw[f.name] = v
    if "BioIter" in kw:
        kw["BioIter"] = int(kw["BioIter"])
    return dc_cls(**kw)


def _bio_ini(params: dict, names) -> dict:
    """BioIni(iXXX_) deck values -> {slot: value}."""
    out = {}
    for k, v in params.items():
        m = re.match(r"BioIni\((\w+)\)", k)
        if not m:
            continue
        nm = m.group(1)
        if nm in names:
            out[names.index(nm)] = float(
                v[0] if isinstance(v, list) else v)
    return out


def load_bio_deck(path_or_params, carbon: bool = False,
                  oxygen: bool = False,
                  model: Optional[str] = None) -> BioDeck:
    """Parse a BPARNAM file (or pre-parsed dict) into a BioDeck.

    carbon/oxygen mirror the app header's CARBON/OXYGEN CPP flags for
    Fennel (they add tracers; the .in file cannot switch them)."""
    from ..core import biology as B
    params = (path_or_params if isinstance(path_or_params, dict)
              else parse_roms_in(path_or_params))
    mdl = model or detect_bio_model(params)

    if mdl == "fennel":
        bio = _fill(B.FennelConfig, params)
        bio = dataclasses.replace(bio, carbon=carbon, oxygen=oxygen)
        names = _SLOTS["fennel"]
        if carbon:
            names = names + _SLOTS["fennel_carbon"]
        if oxygen:
            names = names + ("iOxyg",)
        nbio = len(names)

        def mk(cfg, grid):
            return B.make_fennel_hook(cfg, bio, grid)
    elif mdl == "npzd_powell":
        bio = _fill(B.NPZDConfig, params)
        names = _SLOTS[mdl]
        nbio = len(names)

        def mk(cfg, grid):
            return B.make_npzd_hook(cfg, bio, grid)
    elif mdl == "npzd_franks":
        bio = _fill(B.FranksConfig, params)
        names = _SLOTS[mdl]
        nbio = len(names)

        def mk(cfg, grid):
            return B.make_franks_hook(cfg, bio, grid)
    elif mdl == "npzd_iron":
        bio = _fill(B.IronNPZDConfig, params)
        names = _SLOTS[mdl]
        nbio = len(names)

        def mk(cfg, grid):
            return B.make_iron_npzd_hook(cfg, bio, grid)
    elif mdl == "nemuro":
        bio = _fill(B.NemuroConfig, params)
        names = _SLOTS[mdl]
        nbio = len(names)

        def mk(cfg, grid):
            return B.make_nemuro_hook(cfg, bio, grid)
    elif mdl == "hypoxia_srm":
        rr = params.get("ResRate", 0.0)
        rr = float(rr[0] if isinstance(rr, list) else rr)
        bio = None
        names = _SLOTS[mdl]
        nbio = 1

        def mk(cfg, grid):
            return B.make_hypoxia_hook(cfg, grid, respiration=rr)
    elif mdl == "red_tide":
        bio = _fill(B.RedTideConfig, params)
        names = _SLOTS[mdl]
        nbio = 1

        def mk(cfg, grid):
            import jax.numpy as jnp
            return B.make_red_tide_hook(
                cfg, bio, grid,
                cyst_ini=jnp.zeros(cfg.shape2d, cfg.dtype))
    else:
        raise ValueError(f"unknown biology model {mdl!r}")

    return BioDeck(model=mdl, config=bio, nbio=nbio, names=names,
                   bio_ini=_bio_ini(params, names), make_hook=mk)
