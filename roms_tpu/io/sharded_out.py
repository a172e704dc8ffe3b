"""Shard-parallel history output (PIO analog for mesh runs).

The reference needed mod_pio_netcdf.F (9.3k LoC of SCORPIO wrappers)
because rank-0 gathers do not scale: every history record would move
the whole field through one node.  The TPU-native equivalent writes
each device's shard straight to a chunked tensorstore/zarr array —
no global array is ever materialized on one host — and a separate
export step merges the store into a reference-layout NetCDF file
offline (tools or `export_netcdf` below).

Two input layouts are supported:

* ``write(state)`` — GSPMD ``NamedSharding`` global arrays: each
  addressable shard already knows its global index range.
* ``write_blocked(state_blk, lay)`` — the explicit-halo engine's
  permanently-blocked state (parallel.blocked.BlockLayout): each
  block's interior (halo stripped) maps to a disjoint global slab, so
  the write needs no halo exchange and no unblocking gather.

Single-chip runs should keep io.netcdf.HistoryWriter (scipy NetCDF,
bit-identical layout to the reference); this module is the scaling
path.  Checksum parity with the gathered writer is asserted in
tests/test_sharded_out.py.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

from ..config import ModelConfig

_TRACER0 = ("temp", "salt")


def _ts():
    import tensorstore
    return tensorstore


def _spec(path: str, name: str, shape, dtype: str, chunks):
    return {
        "driver": "zarr",
        "kvstore": {"driver": "file", "path": os.path.join(path, name)},
        "metadata": {
            "shape": list(shape),
            "chunks": list(chunks),
            "dtype": dtype,
        },
    }


class ShardedHistoryWriter:
    """Per-shard HIS/AVG record writer into a tensorstore/zarr group.

    fields: prognostic registry keys (zeta/ubar/vbar/u/v + tracer
    names).  Records append along axis 0; every record write issues
    one region write per (field, addressable shard).
    """

    def __init__(self, path: str, cfg: ModelConfig,
                 fields: Sequence[str] = ("zeta", "ubar", "vbar",
                                          "u", "v", "temp", "salt"),
                 max_records: int = 1024):
        self.path = os.path.abspath(path)
        self.cfg = cfg
        self.fields = tuple(fields)
        self.nrec = 0
        self.max_records = max_records
        os.makedirs(self.path, exist_ok=True)
        self._arrays = {}
        self._times = []
        Mj, Li = cfg.shape2d
        N = cfg.N
        dt = "<f8" if cfg.dtype == "float64" else "<f4"
        ts = _ts()
        for key in self.fields:
            shp = self._field_shape(key, Mj, Li, N)
            # chunk: one record x one modest spatial tile (the zarr
            # chunk grid need not match the mesh; region writes clip)
            chunks = (1,) + tuple(min(s, 512) for s in shp)
            self._arrays[key] = ts.open(
                _spec(self.path, key, (max_records,) + shp, dt,
                      chunks),
                create=True, open=True).result()
        with open(os.path.join(self.path, "manifest.json"), "w") as f:
            json.dump({"fields": list(self.fields),
                       "Lm": cfg.Lm, "Mm": cfg.Mm, "N": N,
                       "dtype": cfg.dtype}, f)

    def _field_shape(self, key, Mj, Li, N):
        if key in ("zeta", "ubar", "vbar"):
            return (Mj, Li)
        return (N, Mj, Li)

    def _state_array(self, state, key):
        from ._ncutil import tracer_names
        if key in ("zeta", "ubar", "vbar", "u", "v"):
            return getattr(state, key)
        tn = tracer_names(self.cfg)
        if key in tn:
            return state.t[tn.index(key)]
        raise KeyError(f"sharded writer: unsupported field {key!r}")

    # -- GSPMD NamedSharding global arrays ---------------------------
    def write(self, state, time=0.0) -> None:
        rec = self.nrec
        futures = []
        for key in self.fields:
            arr = self._state_array(state, key)
            tsa = self._arrays[key]
            shards = getattr(arr, "addressable_shards", None)
            if shards:
                for shard in shards:
                    idx = (rec,) + tuple(shard.index)
                    futures.append(
                        tsa[idx].write(np.asarray(shard.data)))
            else:
                futures.append(tsa[rec].write(np.asarray(arr)))
        for f in futures:
            f.result()
        self._times.append(float(np.asarray(time)))
        self.nrec += 1
        self._write_times()

    # -- explicit-halo blocked layout --------------------------------
    def write_blocked(self, state_blk, lay, time=0.0) -> None:
        """Write a blocked-state record: each block's interior slab
        lands at its global offset; halos are stripped per shard.
        Works whether the blocked field is device-sharded (one block
        per addressable shard) or host-local (all blocks visible)."""
        rec = self.nrec
        futures = []
        g = lay.nghost

        def emit(tsa, block_np, jb, ib):
            blk = block_np[..., g:g + lay.bj, g:g + lay.bi]
            # interior rho rows/cols start at global index 1
            idx = (rec, Ellipsis,
                   slice(jb * lay.bj + 1, (jb + 1) * lay.bj + 1),
                   slice(ib * lay.bi + 1, (ib + 1) * lay.bi + 1))
            futures.append(tsa[idx].write(blk))

        for key in self.fields:
            arr = self._state_array(state_blk, key)
            tsa = self._arrays[key]
            shards = getattr(arr, "addressable_shards", None)
            if shards and len(shards) > 1:
                # device-sharded blocks: each shard IS one block; its
                # global-blocked offsets identify (jb, ib) — only the
                # host-addressable shards are touched (multi-host
                # ready, mp_gather-free)
                for shard in shards:
                    sj = shard.index[-2].start or 0
                    si = shard.index[-1].start or 0
                    emit(tsa, np.asarray(shard.data),
                         sj // lay.BJ, si // lay.BI)
            else:
                a = np.asarray(arr)    # (..., neta*BJ, nxi*BI)
                for jb in range(lay.neta):
                    for ib in range(lay.nxi):
                        emit(tsa,
                             a[..., jb * lay.BJ:(jb + 1) * lay.BJ,
                               ib * lay.BI:(ib + 1) * lay.BI],
                             jb, ib)
        for f in futures:
            f.result()
        self._times.append(float(np.asarray(time)))
        self.nrec += 1
        self._write_times()

    def _write_times(self):
        with open(os.path.join(self.path, "times.json"), "w") as f:
            json.dump(self._times, f)

    def close(self) -> None:
        self._write_times()


def export_netcdf(store_path: str, out_path: str,
                  cfg: Optional[ModelConfig] = None) -> None:
    """Merge a ShardedHistoryWriter store into one reference-layout
    NetCDF file (the offline counterpart of the PIO rearranger):
    reads each record region-by-region from tensorstore and appends
    through io.netcdf's scipy writer conventions."""
    from scipy.io import netcdf_file
    with open(os.path.join(store_path, "manifest.json")) as f:
        man = json.load(f)
    times = []
    tpath = os.path.join(store_path, "times.json")
    if os.path.exists(tpath):
        with open(tpath) as f:
            times = json.load(f)
    nrec = len(times)
    ts = _ts()
    f = netcdf_file(out_path, "w", version=2)
    f.history = "roms_tpu sharded-store NetCDF export"
    Mj, Li = man["Mm"] + 2, man["Lm"] + 2
    N = man["N"]
    f.createDimension("ocean_time", None)
    for d, n in (("xi_rho", Li), ("eta_rho", Mj), ("s_rho", N)):
        f.createDimension(d, n)
    tvar = f.createVariable("ocean_time", "d", ("ocean_time",))
    vars_ = {}
    for key in man["fields"]:
        arr = ts.open({"driver": "zarr",
                       "kvstore": {"driver": "file",
                                   "path": os.path.join(store_path,
                                                        key)}},
                      open=True).result()
        dims = ("ocean_time", "s_rho", "eta_rho", "xi_rho") \
            if arr.ndim == 4 else ("ocean_time", "eta_rho", "xi_rho")
        vars_[key] = (f.createVariable(key, "f", dims), arr)
    for r in range(nrec):
        tvar[r] = times[r]
        for key, (v, arr) in vars_.items():
            v[r] = np.asarray(arr[r].read().result(), np.float32)
    f.flush()
    f.close()
