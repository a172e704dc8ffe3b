"""Asynchronous history output via the native C++ record sink.

`AsyncHistoryWriter` keeps the schema work in Python (the file header
and static fields are laid down once with scipy, matching
HistoryWriter's format exactly) and hands per-record payload writes to
`native/libasync_sink.so`, a pwrite worker thread.  The classic NetCDF
record section is a fixed-stride array -- record r of variable v lives
at `v._begin + r * f._recsize` -- so appending needs no format logic
and the model loop never blocks on disk (the reference's wrt_his.F is
synchronous).

Falls back to the synchronous HistoryWriter when the shared library is
missing (it is built by `make -C native`).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np
from scipy.io import netcdf_file

from ..config import ModelConfig
from .netcdf import HistoryWriter


def parse_classic_header(path):
    """Minimal classic-NetCDF (CDF-1/CDF-2) header parser returning
    ({var_name: (begin, vsize, is_record)}, recsize).  Only the fields
    the async sink needs; format per the NetCDF classic spec."""
    import struct

    with open(path, "rb") as fh:
        buf = fh.read(1 << 20)      # headers are tiny
    pos = [0]

    def u32():
        v = struct.unpack(">I", buf[pos[0]:pos[0] + 4])[0]
        pos[0] += 4
        return v

    def u64():
        v = struct.unpack(">Q", buf[pos[0]:pos[0] + 8])[0]
        pos[0] += 8
        return v

    def name():
        n = u32()
        nm = buf[pos[0]:pos[0] + n].decode()
        pos[0] += (n + 3) // 4 * 4
        return nm

    assert buf[:3] == b"CDF"
    version = buf[3]
    pos[0] = 4
    u32()                            # numrecs
    # dimensions
    tag = u32(); ndims = u32()
    dims = []
    for _ in range(ndims if tag == 0x0A else 0):
        name()
        dims.append(u32())           # 0 = record dim
    # global attributes
    tag = u32(); natt = u32()

    def skip_atts(n):
        _SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 4, 6: 8}
        for _ in range(n):
            name()
            t = u32(); cnt = u32()
            nbytes = _SIZES[t] * cnt
            pos[0] += (nbytes + 3) // 4 * 4

    skip_atts(natt if tag == 0x0C else 0)
    # variables
    tag = u32(); nvars = u32()
    out = {}
    recsize = 0
    for _ in range(nvars if tag == 0x0B else 0):
        nm = name()
        nd = u32()
        dimids = [u32() for _ in range(nd)]
        t2 = u32(); na = u32()
        skip_atts(na if t2 == 0x0C else 0)
        u32()                        # nc_type
        vsize = u32()
        begin = u64() if version == 2 else u32()
        is_rec = bool(nd) and dims[dimids[0]] == 0
        if is_rec:
            recsize += vsize
        out[nm] = (begin, vsize, is_rec)
    return out, recsize

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..",
                         "native", "libasync_sink.so")


def _load_lib():
    try:
        lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
    except OSError:
        return None
    lib.sink_open.restype = ctypes.c_void_p
    lib.sink_open.argtypes = [ctypes.c_char_p]
    lib.sink_write.restype = ctypes.c_int
    lib.sink_write.argtypes = [ctypes.c_void_p, ctypes.c_longlong,
                               ctypes.c_void_p, ctypes.c_longlong]
    lib.sink_set_numrecs.restype = ctypes.c_int
    lib.sink_set_numrecs.argtypes = [ctypes.c_void_p, ctypes.c_uint]
    lib.sink_flush.restype = ctypes.c_int
    lib.sink_flush.argtypes = [ctypes.c_void_p]
    lib.sink_pending.restype = ctypes.c_longlong
    lib.sink_pending.argtypes = [ctypes.c_void_p]
    lib.sink_close.restype = ctypes.c_int
    lib.sink_close.argtypes = [ctypes.c_void_p]
    return lib


class AsyncHistoryWriter(HistoryWriter):
    """Drop-in HistoryWriter whose record writes go through the async
    native sink.  write() costs one host array copy; disk latency is
    hidden behind subsequent model steps."""

    def __init__(self, path: str, cfg: ModelConfig, grid, fields=(
            "zeta", "ubar", "vbar", "u", "v", "temp", "salt")):
        super().__init__(path, cfg, grid, fields)
        self._lib = _load_lib()
        self._path = path
        if self._lib is None:
            self._sink = None
            return
        # Write one zero record through scipy so it finalizes the
        # per-variable begin offsets in the header (with zero records
        # they are all identical placeholders), then parse the layout
        # and let the sink overwrite record storage from index 0.
        self._time[0] = 0.0
        for key in self.fields:
            v = self._vars[key]
            v[0] = np.zeros(v.shape[1:], np.float32)
        self.f.flush()
        self.f.close()
        layout, self._recsize = parse_classic_header(path)
        self._layout = {k: layout[self._key_name(k)][0]
                        for k in self.fields}
        self._time_begin = layout["ocean_time"][0]
        self._sink = self._lib.sink_open(path.encode())
        # records will be appended from 0; reset the header count
        self._lib.sink_set_numrecs(self._sink, 0)

    def _key_name(self, key):
        from .varinfo import REGISTRY
        return REGISTRY[key].name

    def write(self, state, time=None):
        if self._sink is None:        # fallback: synchronous path
            return super().write(state, time)
        r = self.nrec
        t = np.asarray(state.time if time is None else time,
                       dtype=">f8").tobytes()
        self._lib.sink_write(self._sink,
                             self._time_begin + r * self._recsize,
                             t, len(t))
        for key in self.fields:
            begin = self._layout[key]
            payload = np.ascontiguousarray(
                np.asarray(self._extract(state, key),
                           dtype=np.float32)).astype(">f4").tobytes()
            self._lib.sink_write(self._sink,
                                 begin + r * self._recsize,
                                 payload, len(payload))
        self.nrec += 1
        self._lib.sink_set_numrecs(self._sink, self.nrec)

    def pending_bytes(self) -> int:
        if self._sink is None:
            return 0
        return int(self._lib.sink_pending(self._sink))

    def close(self):
        if self._sink is None:
            return super().close()
        self._lib.sink_flush(self._sink)
        self._lib.sink_close(self._sink)
        self._sink = None
