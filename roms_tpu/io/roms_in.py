"""Reader for reference-format `roms_*.in` input scripts.

Provides a migration path for users of the reference model: their
standard-input files (the `keyword == value` format decoded by
ROMS/Utility/inp_par.F + read_phypar.F) parse directly into a
`ModelConfig`.

Supported syntax:
  - `KEY == value [value ...]`   (plural assignment)
  - `KEY = value`                (singular assignment)
  - `!` comments, blank lines
  - Fortran double literals (`3.0d-4`), logicals (`T`/`F`)
  - repetition counts (`2*0.0d0`)
  - `LBC(isFsur) == Per Clo Per Clo` edge specs (order W S E N,
    read_phypar.F keyword tables)

Unrecognized keywords are retained in the returned dict so callers can
inspect application-specific entries; `to_config` maps the physics
subset onto the native dataclass tree.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Union

from .. import config as C

_COMMENT = re.compile(r"!.*$")
_ASSIGN = re.compile(r"^\s*([A-Za-z0-9_()\s]+?)\s*==?\s*(.*)$")


def _parse_value(tok: str) -> Union[float, int, bool, str]:
    t = tok.strip()
    if t in ("T", ".true.", ".TRUE."):
        return True
    if t in ("F", ".false.", ".FALSE."):
        return False
    ft = t.replace("d", "e").replace("D", "e")
    try:
        if re.fullmatch(r"[+-]?\d+", t):
            return int(t)
        return float(ft)
    except ValueError:
        return t


def _expand(tokens: List[str]) -> List:
    out = []
    for tok in tokens:
        m = re.fullmatch(r"(\d+)\*(.+)", tok)
        if m:
            out.extend([_parse_value(m.group(2))] * int(m.group(1)))
        else:
            out.append(_parse_value(tok))
    return out


def parse_roms_in(text_or_path: str) -> Dict:
    """Parse a roms.in script (path or raw text) into {keyword: value}.

    Repeated keywords accumulate into lists (multi-line plural values,
    e.g. per-tracer Hadvection rows)."""
    if "\n" not in text_or_path and not text_or_path.lstrip().startswith("!"):
        with open(text_or_path) as fh:
            text = fh.read()
    else:
        text = text_or_path

    params: Dict = {}
    for raw in text.splitlines():
        line = _COMMENT.sub("", raw).strip()
        if not line:
            continue
        m = _ASSIGN.match(line)
        if not m:
            continue
        key = re.sub(r"\s+", "", m.group(1))
        vals = _expand(m.group(2).split())
        if not vals:
            continue
        value = vals[0] if len(vals) == 1 else vals
        if key in params:
            prev = params[key]
            params[key] = (prev if isinstance(prev, list) else [prev])
            params[key] += vals
        else:
            params[key] = value
    return params


_LBC_KINDS = {
    "per": C.PERIODIC, "clo": C.CLOSED, "gra": C.GRADIENT,
    "cla": C.CLAMPED, "rad": C.RADIATION, "radnud": C.RADIATION,
    "fla": C.FLATHER, "che": C.CHAPMAN_EXPLICIT,
    "cha": C.CHAPMAN_IMPLICIT, "nes": C.GRADIENT, "shc": C.GRADIENT,
    "red": C.GRADIENT,
}


def _lbc(params: Dict, key: str) -> C.LBC:
    spec = params.get(key)
    if spec is None:
        return C.LBC()
    if not isinstance(spec, list):
        spec = [spec]
    kinds = [_LBC_KINDS.get(str(s).lower()[:3], C.CLOSED) for s in spec[:4]]
    while len(kinds) < 4:
        kinds.append(C.CLOSED)
    west, south, east, north = kinds
    return C.LBC(west=west, south=south, east=east, north=north)


_HADV_MAP = {
    "u3": C.UPSTREAM3, "c2": C.CENTERED2, "c4": C.CENTERED4,
    "a4": C.AKIMA4, "sp": "splines", "hs": C.HSIMT, "mp": C.MPDATA,
    "su": C.SPLIT_U3,
}


def _adv_scheme(params: Dict, key: str, default: str) -> str:
    spec = params.get(key)
    if spec is None:
        return default
    if isinstance(spec, list):
        spec = spec[0]
    return _HADV_MAP.get(str(spec).lower()[:2], default)


def _first(v, default=None):
    if v is None:
        return default
    return v[0] if isinstance(v, list) else v


def to_config(params: Dict, **overrides) -> C.ModelConfig:
    """Map parsed roms.in parameters onto a ModelConfig.

    Keyword meanings follow read_phypar.F; anything the native config
    does not model is ignored.  `overrides` are applied last via
    dataclasses.replace."""
    g = params.get

    def tup(key, default):
        v = g(key)
        if v is None:
            return default
        return tuple(v) if isinstance(v, list) else (v,) * len(default)

    nat = 2   # itemp + isalt (mod_param.F NAT); NT grows with tnu2 list
    vert = C.VerticalCoordConfig(
        N=int(g("N", 16)),
        Vtransform=int(_first(g("Vtransform"), 2)),
        Vstretching=int(_first(g("Vstretching"), 4)),
        theta_s=float(_first(g("THETA_S"), 3.0)),
        theta_b=float(_first(g("THETA_B"), 0.0)),
        Tcline=float(_first(g("TCLINE"), 25.0)))
    eos = C.EOSConfig(
        R0=float(_first(g("R0"), 1027.0)),
        T0=float(_first(g("T0"), 14.0)),
        S0=float(_first(g("S0"), 35.0)),
        Tcoef=float(_first(g("TCOEF"), 1.7e-4)),
        Scoef=float(_first(g("SCOEF"), 0.0)))
    mixing = C.MixingConfig(
        visc2=float(_first(g("VISC2"), 0.0)),
        visc4=float(_first(g("VISC4"), 0.0)),
        tnu2=tup("TNU2", (0.0, 0.0)),
        tnu4=tup("TNU4", (0.0, 0.0)),
        akv_bak=float(_first(g("AKV_BAK"), 1.0e-5)),
        akt_bak=tup("AKT_BAK", (1.0e-6, 1.0e-6)),
        akk_bak=float(_first(g("AKK_BAK"), 5.0e-6)),
        akp_bak=float(_first(g("AKP_BAK"), 5.0e-6)),
        gls_p=float(_first(g("GLS_P"), 3.0)),
        gls_m=float(_first(g("GLS_M"), 1.5)),
        gls_n=float(_first(g("GLS_N"), -1.0)),
        gls_cmu0=float(_first(g("GLS_CMU0"), 0.5477)),
        gls_c1=float(_first(g("GLS_C1"), 1.44)),
        gls_c2=float(_first(g("GLS_C2"), 1.92)),
        gls_c3m=float(_first(g("GLS_C3M"), -0.4)),
        gls_c3p=float(_first(g("GLS_C3P"), 1.0)),
        gls_sigk=float(_first(g("GLS_SIGK"), 1.0)),
        gls_sigp=float(_first(g("GLS_SIGP"), 1.3)),
        gls_kmin=float(_first(g("GLS_Kmin"), 7.6e-6)),
        gls_pmin=float(_first(g("GLS_Pmin"), 1.0e-12)),
        gls_Zos=float(_first(g("ZOS"), 0.02)))
    rdrg2 = float(_first(g("RDRG2"), 3.0e-3))
    rdrg = float(_first(g("RDRG"), 3.0e-4))
    drag = C.BottomDragConfig(
        rdrg=rdrg, rdrg2=rdrg2,
        Zob=float(_first(g("Zob"), 0.02)))
    bc = C.BoundaryConfig(
        zeta=_lbc(params, "LBC(isFsur)"),
        ubar=_lbc(params, "LBC(isUbar)"),
        vbar=_lbc(params, "LBC(isVbar)"),
        u=_lbc(params, "LBC(isUvel)"),
        v=_lbc(params, "LBC(isVvel)"),
        t=_lbc(params, "LBC(isTvar)"),
        tke=_lbc(params, "LBC(isMtke)"))

    cfg = C.ModelConfig(
        Lm=int(g("Lm", 41)), Mm=int(g("Mm", 80)),
        NT=max(nat, len(mixing.tnu2)), NAT=nat,
        dt=float(_first(g("DT"), 300.0)),
        ndtfast=int(_first(g("NDTFAST"), 30)),
        vert=vert, eos=eos, mixing=mixing, drag=drag, bc=bc,
        rho0=float(_first(g("RHO0"), 1025.0)),
        gamma2=float(_first(g("GAMMA2"), 1.0)),
        hadv=_adv_scheme(params, "Hadvection", C.UPSTREAM3),
        vadv=_adv_scheme(params, "Vadvection", C.CENTERED4))
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg


def load_config(path: str, **overrides) -> C.ModelConfig:
    """One-call convenience: parse a roms.in file into a ModelConfig."""
    return to_config(parse_roms_in(path), **overrides)
