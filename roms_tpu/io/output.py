"""Per-step output dispatcher (output.F analog).

The reference's `output` routine (ROMS/Utility/output.F:3-755) runs once
per baroclinic step and decides, from the cadence keywords of the input
deck (NHIS/NQCK/NAVG/NDIA/NRST, roms_upwelling.in), which streams get a
record: define-on-first-touch, HIS/QCK snapshots, AVG running means
(set_avg.F), and the cycling RST stream.  `OutputManager` is that
dispatcher for the TPU model: construct it from the dict produced by
`io.roms_in.parse_roms_in` (so a reference input deck drives the same
files it would drive under Fortran) or from explicit keyword arguments,
then call `.step(state)` after every completed model step.

Field selection follows the deck's `Hout(id...)`/`Qout(...)`/`Aout(...)`
switches, translated to native registry keys through the `index_code`
column of io/varinfo.py (mod_ncparam id names).  Ids whose extraction
the writers do not support yet are collected in `self.unsupported`
rather than silently dropped.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional

import numpy as np

from ..config import ModelConfig
from ._ncutil import tracer_names
from .netcdf import AverageAccumulator, HistoryWriter, supported_keys
from .rst_netcdf import RestartWriter
from .varinfo import REGISTRY


def _acc_tree(acc, d):
    """Sum a (possibly nested) dict-of-arrays budget into `acc`
    on host (set_diags.F DiaTwrk accumulation)."""
    if isinstance(d, dict):
        if acc is None:
            acc = {}
        for k, v in d.items():
            acc[k] = _acc_tree(acc.get(k), v)
        return acc
    v = np.asarray(d, dtype=np.float64)
    return v if acc is None else acc + v


def _mean_tree(acc, n):
    if isinstance(acc, dict):
        return {k: _mean_tree(v, n) for k, v in acc.items()}
    return acc / max(n, 1)

# quick-stream surface-slice ids (wrt_quick.F idSur* switches)
_SURFACE_CODES = {"idSurT": "temp_sur", "idSurS": "salt_sur",
                  "idSurU": "u_sur", "idSurV": "v_sur",
                  "idUsur": "u_sur", "idVsur": "v_sur"}


def _fields_from_switches(params: Dict, prefix: str, cfg=None,
                          supported=None):
    """Hout(idFsur)=True ... -> tuple of registry keys, skipping ids we
    cannot extract (returned separately).

    The id->key map is driven by the registry index codes plus the
    cfg tracer-name table for the per-tracer idTvar list (mod_ncparam
    semantics: Hout(idTvar) carries one flag per tracer in deck
    order, bio/sediment tracers included)."""
    by_code: Dict[str, list] = {}
    for key, info in REGISTRY.items():
        if info.index_code and info.index_code != "idTvar":
            by_code.setdefault(info.index_code, []).append(key)
    if cfg is not None:
        by_code["idTvar"] = list(tracer_names(cfg))
    else:
        by_code["idTvar"] = ["temp", "salt"]
    for code, key in _SURFACE_CODES.items():
        by_code.setdefault(code, [key])
    fields, unsupported = [], []
    ok = supported if supported is not None else set()
    pat = re.compile(rf"^{prefix}\((\w+)\)$")
    any_switch = False
    for key, val in params.items():
        m = pat.match(key)
        if not m:
            continue
        any_switch = True
        code = m.group(1)
        keys = by_code.get(code, [])
        flags = val if isinstance(val, list) else [val] * max(len(keys),
                                                              1)
        if not keys:
            if (val is True) or (isinstance(val, list) and any(val)):
                unsupported.append(code)
            continue
        # per-tracer flag lists can be longer than the registry's
        # tracer keys (bio tracers); the overflow is unsupported, not
        # silently dropped
        for on in flags[len(keys):]:
            if on:
                unsupported.append(code)
        for k, on in zip(keys, flags):
            if on and k in ok:
                fields.append(k)
            elif on:
                unsupported.append(f"{code}:{k}")
    return tuple(fields), unsupported, any_switch


class OutputManager:
    """Cadence-driven stream dispatcher for HIS/QCK/AVG/RST.

    params: parsed roms_*.in dict (cadences + names + switches), or
    None with explicit overrides.  Writes happen when
    ``state.iic % cadence == 0`` (records at step N, 2N, ...), matching
    the reference's end-of-step output call.
    """

    def __init__(self, cfg: ModelConfig, grid, params: Optional[Dict]
                 = None, outdir: str = ".", checksum: str | None = None,
                 nhis: int = 0, nqck: int = 0, navg: int = 0,
                 nrst: int = 0, ndia: int = 0, his_fields=None,
                 initial_state=None, model=None):
        params = params or {}
        self.cfg = cfg
        self.grid = grid
        self.model = model
        self.unsupported: list = []
        self._supported = supported_keys(cfg, model)

        def cad(key, arg):
            return int(params.get(key, arg) or 0)

        self.nhis = cad("NHIS", nhis)
        self.nqck = cad("NQCK", nqck)
        self.navg = cad("NAVG", navg)
        self.nrst = cad("NRST", nrst)
        self.ndia = cad("NDIA", ndia)

        def path(key, default):
            return os.path.join(outdir, params.get(key, default))

        def pick(prefix, fallback):
            # a deck WITH switches rules, even if it disables every
            # field (time-only stream); the fallback applies only when
            # the deck carries no switches for this stream at all
            f, unsup, any_switch = _fields_from_switches(
                params, prefix, cfg, self._supported)
            self.unsupported += unsup
            return f if any_switch else fallback

        nbed = 0
        if initial_state is not None and initial_state.sed is not None:
            # multi-layer bed stratigraphy (sed_bed.BedState) carries
            # .thick; the single-pool SedState (bed_mass only) has no
            # bed-layer output dimension
            thick = getattr(initial_state.sed, "thick", None)
            if thick is not None:
                nbed = int(thick.shape[0])

        default_fields = tuple(his_fields or
                               ("zeta", "ubar", "vbar", "u", "v",
                                "temp", "salt"))
        self.his = self.qck = self.avg_writer = self.rst = None
        self.dia = None
        self.dia_uv = None
        self.avg = None
        if self.nhis:
            self.his = HistoryWriter(
                path("HISNAME", "roms_his.nc"), cfg, grid,
                fields=pick("Hout", default_fields), checksum=checksum,
                model=model, nbed=nbed)
        if self.nqck:
            self.qck = HistoryWriter(
                path("QCKNAME", "roms_qck.nc"), cfg, grid,
                fields=pick("Qout", ("zeta", "temp_sur", "u_sur",
                                     "v_sur")), checksum=checksum,
                model=model, nbed=nbed)
        if self.navg:
            afields = pick("Aout", default_fields)
            self.avg_writer = HistoryWriter(
                path("AVGNAME", "roms_avg.nc"), cfg, grid,
                fields=afields, checksum=checksum, model=model,
                nbed=nbed)
            self.avg = AverageAccumulator(cfg, afields)
            self._avg_t0 = None
        if self.ndia:
            # DIA stream (def_diags.F/wrt_diags.F): per-term tracer
            # budgets fed by Model.step_diag — the driver must call
            # step(state, diag=...) (wants_diag property).  Dout term
            # codes: iTrate/iThadv/iTvadv/iTvdif map onto the budget
            # the model collects; the xi/eta/s splits (iTxadv etc.)
            # are combined here and recorded as unsupported.
            from .netcdf import DiagWriter
            term_map = {"iTrate": "rate", "iThadv": "hadv",
                        "iTvadv": "vadv", "iTvdif": "vdif"}
            tn = tracer_names(cfg)
            dtr: list = []
            pat = re.compile(r"^Dout\((\w+)\)$")
            for key, val in params.items():
                m = pat.match(key)
                if not m:
                    continue
                code = m.group(1)
                flags = val if isinstance(val, list) else [val]
                if code in term_map:
                    for i, on in enumerate(flags):
                        if on and i < len(tn) and tn[i] not in dtr:
                            dtr.append(tn[i])
                elif any(f is True for f in flags):
                    self.unsupported.append(code)
            self.dia = DiagWriter(
                path("DIANAME", "roms_dia.nc"), cfg, grid,
                tracers=tuple(dtr) or tuple(tn[:cfg.NAT]))
            # set_diags.F accumulates budgets over the NDIA window and
            # writes the time-average, not the last instantaneous step
            self._dia_acc: Optional[Dict] = None
            self._dia_n = 0
            self._diauv_acc: Optional[Dict] = None
            self._diauv_n = 0
        # DIAGNOSTICS_UV: any Dout(M2*/M3*) switch activates the
        # momentum-budget stream (set_diags.F u/v terms; the M2
        # depth-integrated splits are covered by the Hz-weighted 3-D
        # terms' vertical sums)
        if self.ndia and any(
                re.match(r"^Dout\(M[23]\w+\)$", k) and (
                    v is True or (isinstance(v, list) and any(v)))
                for k, v in params.items()):
            from .netcdf import DiagUVWriter
            self.dia_uv = DiagUVWriter(
                path("DIAUVNAME", "roms_dia_uv.nc"), cfg, grid)
            # the M2/M3 codes are represented; drop them from the
            # unsupported list
            self.unsupported = [
                u for u in self.unsupported
                if not (u.startswith("M2") or u.startswith("M3"))]
        if self.nrst:
            cycle = 2 if params.get("LcycleRST", True) else 0
            self.rst = RestartWriter(
                path("RSTNAME", "roms_rst.nc"), cfg, grid,
                cycle=cycle, checksum=checksum)
            if initial_state is not None:
                # define the mix_* schema up-front (classic NetCDF
                # cannot add variables after the first record)
                self.rst._ensure_mix_vars(initial_state.mix)
        # STA stream from the stations deck (SPOSNAM + NSTA cadence)
        self.nsta = cad("NSTA", 0)
        self.sta = None
        spos = params.get("SPOSNAM")
        if self.nsta and spos and os.path.exists(spos):
            from .sta_netcdf import StationWriter, parse_stations_in
            deck = parse_stations_in(spos)
            ij = [(int(round(y)), int(round(x)))
                  for g, flag, x, y in deck["pos"] if flag == 0]
            # StationRecorder gathers prognostic fields only
            ok = {"zeta", "ubar", "vbar", "u", "v", "temp", "salt"}
            sta_fields, unsup, any_sw = _fields_from_switches(
                {f"Sout({k})": v for k, v in deck["sout"].items()},
                "Sout", cfg, ok)
            self.unsupported += unsup
            if ij:
                self.sta = StationWriter(
                    path("STANAME", "roms_sta.nc"), cfg, ij,
                    fields=sta_fields or ("zeta", "temp", "salt",
                                          "u", "v"))
        # per-step stdout diagnostics table (diag.F:440-486, NINFO)
        self.ninfo = cad("NINFO", 0)
        self._info_header = False

    def _info(self, state) -> None:
        """Print one reference-style global-diagnostics line:
        TIME-STEP  KINETIC_ENRG  POTEN_ENRG  TOTAL_ENRG  NET_VOLUME
        plus the Courant/speed detail line (diag.F:448-486)."""
        import sys

        from ..core.diag import diag as diag_fn
        d = diag_fn(self.cfg, self.grid, state)
        if not self._info_header:
            self._info_header = True
            print(f"{'TIME-STEP':>10s} {'KINETIC_ENRG':>14s} "
                  f"{'POTEN_ENRG':>14s} {'TOTAL_ENRG':>14s} "
                  f"{'NET_VOLUME':>14s}")
            print(f"{'':>10s} {'Cu+Cv+Cw':>14s} {'Cw':>14s} "
                  f"{'Max Speed':>14s}")
        iic = int(np.asarray(state.iic))
        ke = float(np.asarray(d.avgke))
        pe = float(np.asarray(d.avgpe))
        vol = float(np.asarray(d.volume))
        print(f"{iic:>10d} {ke:14.6E} {pe:14.6E} {ke + pe:14.6E} "
              f"{vol:14.6E}")
        print(f"{'':>10s} {float(np.asarray(d.max_courant)):14.6E} "
              f"{float(np.asarray(d.max_courant_w)):14.6E} "
              f"{float(np.asarray(d.max_speed)):14.6E}")
        if int(np.asarray(d.exit_flag)) != 0:
            from ..core.diag import blowup_string
            print("Blowing-up:", blowup_string(d), file=sys.stderr)

    @property
    def wants_diag(self) -> bool:
        """True when the driver should advance with Model.step_diag
        and pass the budget dict into step(state, diag=...)."""
        return self.dia is not None

    @property
    def wants_diag_uv(self) -> bool:
        """True when the driver should advance with
        Model.step_diag_uv and pass diag_uv into step()."""
        return self.dia_uv is not None

    def step(self, state, diag=None, diag_uv=None) -> None:
        """Dispatch all due streams for a just-completed step."""
        iic = int(np.asarray(state.iic))
        if self.dia is not None and diag is not None:
            self._dia_acc = _acc_tree(self._dia_acc, diag)
            self._dia_n += 1
            if iic % self.ndia == 0:
                self.dia.write(_mean_tree(self._dia_acc, self._dia_n),
                               state.time)
                self._dia_acc, self._dia_n = None, 0
        if self.dia_uv is not None and diag_uv is not None:
            self._diauv_acc = _acc_tree(self._diauv_acc, diag_uv)
            self._diauv_n += 1
            if iic % self.ndia == 0:
                self.dia_uv.write(
                    _mean_tree(self._diauv_acc, self._diauv_n),
                    state.time)
                self._diauv_acc, self._diauv_n = None, 0
        t = float(np.asarray(state.time))
        if self.ninfo and iic % self.ninfo == 0:
            self._info(state)
        if self.avg is not None:
            if self._avg_t0 is None:
                self._avg_t0 = t
            self.avg.accumulate(self.avg_writer._extract, state)
            if iic % self.navg == 0 and self.avg._count:
                mean = self.avg.mean()
                i = self.avg_writer.nrec
                # record time = center of the averaging window
                # (set_avg.F AVGtime semantics)
                self.avg_writer._time[i] = 0.5 * (self._avg_t0 + t)
                for key in self.avg_writer.fields:
                    self.avg_writer._vars[key][i] = np.asarray(
                        mean[key], np.float32)
                self.avg_writer.nrec += 1
                self.avg_writer.f.flush()
                self.avg.reset()
                self._avg_t0 = None
        if self.his is not None and iic % self.nhis == 0:
            self.his.write(state)
        if self.qck is not None and iic % self.nqck == 0:
            self.qck.write(state)
        if self.rst is not None and iic % self.nrst == 0:
            self.rst.write(state)
        if self.sta is not None and iic % self.nsta == 0:
            self.sta.write(state)

    def close(self) -> None:
        for w in (self.his, self.qck, self.avg_writer, self.rst,
                  self.sta, self.dia, self.dia_uv):
            if w is not None:
                w.close()
