"""IPARNAM sea-ice parameter-file reader (read_phypar.F:4273 `CASE
('IPARNAM')` -> ice_inp chain; reference deck ROMS/External/ice.in).

Maps the ice.in keywords onto `core.seaice.IceConfig` fields:

    nEVP        -> nevp          elastic substeps per ice step
    AirRho      -> rho_air
    IceRho      -> rhoi
    SnowDryRho  -> rhos
    Cd_ai/Cd_io -> air-ice / ice-ocean drag
    Astrength   -> strength concentration exponent
    zetaMin/Max -> bulk-viscosity clip
    ellip_sq    -> yield-ellipse eccentricity squared
    min_ai/max_ai/min_hi -> concentration/thickness bounds

Keywords with no runtime role in the TPU model (SnowWetRho,
max_hmelt melt ponds, stressAng, ice_emiss/spec_heat_air/
trans_coeff/sublimation — the bulk-formula constants live in the
bulk-flux kernel) are accepted and reported in `unused` rather than
silently dropped, following the VarInfo `unsupported` discipline.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

from .roms_in import parse_roms_in

_MAP = {
    "NEVP": ("nevp", int),
    "AIRRHO": ("rho_air", float),
    "ICERHO": ("rhoi", float),
    "SNOWDRYRHO": ("rhos", float),
    "CD_AI": ("Cd_ai", float),
    "CD_IO": ("Cd_io", float),
    "ASTRENGTH": ("Astrength", float),
    "ZETAMIN": ("zetamin", float),
    "ZETAMAX": ("zetamax", float),
    "ELLIP_SQ": ("ellip_sq", float),
    "MIN_AI": ("min_ai", float),
    "MAX_AI": ("ai_max", float),
    "MIN_HI": ("hi_min", float),
}

_ACCEPTED_INERT = {
    "SNOWWETRHO", "MAX_HMELT", "STRESSANG", "ICE_EMISS",
    "SPEC_HEAT_AIR", "TRANS_COEFF", "SUBLIMATION",
}


class IceDeck(NamedTuple):
    config: object          # core.seaice.IceConfig
    unused: tuple           # accepted-but-inert keywords present
    unknown: tuple          # unrecognized non-Hout keywords


def load_ice_deck(path_or_params) -> IceDeck:
    from ..core.seaice import IceConfig
    params = (path_or_params if isinstance(path_or_params, dict)
              else parse_roms_in(path_or_params))
    overrides = {}
    unused = []
    unknown = []
    for key, val in params.items():
        k = key.upper()
        if k.startswith(("HOUT", "AOUT", "QOUT", "LCYCLE", "TITLE")):
            continue                       # output switches: OutputManager
        if k in _MAP:
            field, cast = _MAP[k]
            v = val[0] if isinstance(val, list) else val
            overrides[field] = cast(float(v))
        elif k in _ACCEPTED_INERT:
            unused.append(k)
        else:
            unknown.append(k)
    cfg = IceConfig(**overrides)
    # min_ai cannot exceed ai_max and nevp must be positive — the
    # reference aborts in ice_inp on inconsistent input
    if cfg.nevp < 1:
        raise ValueError(f"IPARNAM: nEVP must be >= 1, got {cfg.nevp}")
    if not (0.0 <= cfg.min_ai <= cfg.ai_max <= 1.0):
        raise ValueError(
            f"IPARNAM: need 0 <= min_ai <= max_ai <= 1, got "
            f"min_ai={cfg.min_ai} max_ai={cfg.ai_max}")
    return IceDeck(config=cfg, unused=tuple(unused),
                   unknown=tuple(unknown))
