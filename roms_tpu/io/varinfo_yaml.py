"""Loader for ROMS varinfo.yaml metadata dictionaries.

The reference registers every I/O variable in a 7951-line YAML file
(ROMS/External/varinfo.yaml) parsed by a hand-rolled F2003 YAML parser
(ROMS/Utility/yaml_parser.F).  This is the TPU build's equivalent: a
small parser for exactly that dialect — a `metadata:` list of flat
`- variable:` blocks with scalar keys, `&anchor value` definitions and
`*anchor` references, and `#` comments — so a user's existing
varinfo.yaml (reference or customized) drops straight into the
registry.

Usage:
    from roms_tpu.io.varinfo_yaml import load_varinfo_yaml
    registry = load_varinfo_yaml(path)          # {name: VarInfo}
"""

from __future__ import annotations

import re
from typing import Dict

from .varinfo import VarInfo

# staggered C-grid type -> registry location code
_TYPE_TO_LOC = {
    "r2dvar": "r2", "u2dvar": "u2", "v2dvar": "v2", "p2dvar": "r2",
    "r3dvar": "r3", "u3dvar": "u3", "v3dvar": "v3", "p3dvar": "r3",
    "w3dvar": "w3", "b3dvar": "b3", "l3dvar": "r3", "l4dvar": "r3",
    "nulvar": "nul",
    # the reference file's own typo: bvstrc has `type: idVbrs`
    # (varinfo.yaml:1013) where v2dvar is meant
    "idVbrs": "v2",
}

_KEY = re.compile(r"^\s*(-\s+)?([A-Za-z_][A-Za-z0-9_]*):\s*(.*?)\s*$")


def _parse_scalar(raw: str, anchors: Dict[str, str]) -> str:
    # strip trailing comment (not inside quotes — the dialect has none)
    val = raw.split("#", 1)[0].strip()
    if val.startswith("&"):
        parts = val.split(None, 1)
        name = parts[0][1:]
        val = parts[1].strip() if len(parts) > 1 else ""
        anchors[name] = val
    elif val.startswith("*"):
        val = anchors.get(val[1:], val)
    if val.startswith("'") and val.endswith("'") and len(val) >= 2:
        val = val[1:-1]
    return val


def _to_float(v: str, default: float) -> float:
    try:
        return float(v.replace("d", "e").replace("D", "e"))
    except (ValueError, AttributeError):
        return default


def load_varinfo_yaml(path_or_text: str) -> Dict[str, VarInfo]:
    """Parse a varinfo.yaml file (path or raw text) into a registry
    keyed by variable name."""
    if "\n" in path_or_text:
        text = path_or_text
    else:
        with open(path_or_text) as fh:
            text = fh.read()

    anchors: Dict[str, str] = {}
    registry: Dict[str, VarInfo] = {}
    entry = None

    def flush(e):
        if not e or "variable" not in e:
            return
        loc = _TYPE_TO_LOC.get(e.get("type", ""), "nul")
        name = e["variable"]
        if name in registry:
            # duplicate names later in the file (impulse forcing,
            # adjoint variants...) keep distinct index_codes in the
            # reference; the primary state definition comes first
            return
        registry[name] = VarInfo(
            name=name,
            long_name=e.get("long_name", ""),
            units=e.get("units", ""),
            location=loc,
            time=bool(e.get("time", "")),
            standard_name=e.get("standard_name", ""),
            field=e.get("field", ""),
            index_code=e.get("index_code", ""),
            scale=_to_float(e.get("scale", ""), 1.0),
            add_offset=_to_float(e.get("add_offset", ""), 0.0),
        )

    for raw in text.splitlines():
        stripped = raw.split("#", 1)[0].rstrip()
        if not stripped.strip():
            continue
        m = _KEY.match(raw)
        if not m:
            continue
        dash, key, value = m.groups()
        value = _parse_scalar(value, anchors)
        if dash:                      # new list item
            flush(entry)
            entry = {key: value} if value else {key: ""}
        elif entry is not None and raw.startswith((" ", "\t")) \
                and not raw.lstrip().startswith("-"):
            entry[key] = value
        else:
            # top-level scalar (convention:, shortwave: &SWRAD ...)
            continue
    flush(entry)
    return registry
