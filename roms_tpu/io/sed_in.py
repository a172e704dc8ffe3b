"""SPARNAM sediment parameter-file reader (read_sedpar / sediment_inp.h
analog).

Reference decks (ROMS/External/sediment_*.in) list per-class plural
values for MUD_* (NCS cohesive classes) and SAND_* (NNS non-cohesive
classes); read_sedpar.F stores mud classes first, then sand (idsed
ordering, sedbed_mod.h).  Units follow the reference input conventions:
SD50 in mm (converted to m here like read_sedpar), WSED in mm/s,
ERATE kg/m2/s, TAU_CE/TAU_CD N/m2, SRHO kg/m3, CSED kg/m3 initial
concentration.
"""

from __future__ import annotations

from typing import NamedTuple

from .roms_in import parse_roms_in


class SedDeck(NamedTuple):
    config: object             # core.sediment.SedConfig (mud+sand)
    nsed: int
    names: tuple               # ('mud_01', ..., 'sand_01', ...)
    csed: tuple                # initial concentrations kg/m3 per class
    newlayer_thick: float
    bedload_coeff: float
    make_hook: object          # make_hook(cfg, grid) -> sed_fn


def _plural(params, key, default=None):
    if key not in params:
        return [] if default is None else [default]
    v = params[key]
    return [float(x) for x in (v if isinstance(v, list) else [v])]


def load_sed_deck(path_or_params) -> SedDeck:
    from ..core.sediment import SedConfig, make_sed_hook
    params = (path_or_params if isinstance(path_or_params, dict)
              else parse_roms_in(path_or_params))

    def block(prefix):
        d50 = _plural(params, f"{prefix}_SD50")
        n = len(d50)
        if n == 0:
            return dict(n=0)

        def arr(key, default):
            v = _plural(params, f"{prefix}_{key}") or [default] * n
            if len(v) == 1 and n > 1:
                v = v * n            # scalar broadcast over classes
            if len(v) != n:
                raise ValueError(
                    f"SPARNAM: {prefix}_{key} lists {len(v)} values "
                    f"for {n} {prefix} classes ({prefix}_SD50)")
            return v

        return dict(
            n=n,
            d50=[x * 1.0e-3 for x in d50],          # mm -> m
            wsed=arr("WSED", 1.0),
            erate=arr("ERATE", 5e-4),
            tau_ce=arr("TAU_CE", 0.05),
            srho=arr("SRHO", 2650.0),
            poros=arr("POROS", 0.5),
            csed=arr("CSED", 0.0),
        )

    mud = block("MUD")
    sand = block("SAND")
    nsed = mud["n"] + sand["n"]
    if nsed == 0:
        raise ValueError(
            "SPARNAM deck declares no MUD_SD50/SAND_SD50 classes")

    def cat(key):
        return tuple((mud.get(key) or []) + (sand.get(key) or []))

    cfgd = SedConfig(
        nsed=nsed, offset=0,
        Wsed=cat("wsed"), Erate=cat("erate"), tau_ce=cat("tau_ce"),
        Srho=cat("srho"), d50=cat("d50"),
        poros=(cat("poros") or (0.5,))[0],
    )
    names = tuple(f"mud_{i+1:02d}" for i in range(mud["n"])) + \
        tuple(f"sand_{i+1:02d}" for i in range(sand["n"]))

    nl = params.get("NEWLAYER_THICK", 0.0)
    bl = params.get("BEDLOAD_COEFF", 0.0)

    def mk(cfg, grid, offset: int = 0):
        # offset: sediment block position after NAT (+nbio when a
        # BPARNAM biology block precedes it, mod_param tracer order)
        import dataclasses as _dc
        return make_sed_hook(cfg, _dc.replace(cfgd, offset=offset),
                             grid)

    return SedDeck(
        config=cfgd, nsed=nsed, names=names, csed=cat("csed"),
        newlayer_thick=float(nl[0] if isinstance(nl, list) else nl),
        bedload_coeff=float(bl[0] if isinstance(bl, list) else bl),
        make_hook=mk)
