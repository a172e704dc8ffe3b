"""Native async forcing prefetcher (the get_data.F analog).

Wraps native/libprefetch.so: a C++ reader thread stages forcing-file
records into a host ring AHEAD of the model clock, so crossing a
snapshot boundary costs a memcpy instead of a disk read (the
reference's get_data reads synchronously inside the step loop,
get_data.F:102-426).  Falls back to synchronous numpy reads when the
library is absent.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))),
            "native", "libprefetch.so")
        lib = ctypes.CDLL(path)
        lib.pf_open.restype = ctypes.c_void_p
        lib.pf_open.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                                ctypes.c_longlong, ctypes.c_longlong,
                                ctypes.c_int]
        for name in ("pf_request", "pf_ready", "pf_get"):
            getattr(lib, name).argtypes = [ctypes.c_void_p,
                                           ctypes.c_longlong] + \
                ([ctypes.c_void_p] if name == "pf_get" else [])
            getattr(lib, name).restype = ctypes.c_int
        lib.pf_hits.argtypes = [ctypes.c_void_p]
        lib.pf_hits.restype = ctypes.c_longlong
        lib.pf_misses.argtypes = [ctypes.c_void_p]
        lib.pf_misses.restype = ctypes.c_longlong
        lib.pf_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


class RecordPrefetcher:
    """Prefetch fixed-stride records of a binary file.

    rec_shape/dtype describe one record; first_offset/stride give its
    byte layout (e.g. the record section of a classic NetCDF file or a
    raw .npy payload).  request(k) schedules an async read; get(k)
    returns the array (zero-wait when staged).
    """

    def __init__(self, path: str, rec_shape, dtype, first_offset: int,
                 stride: int = None, n_slots: int = 4):
        self.shape = tuple(rec_shape)
        self.dtype = np.dtype(dtype)
        self.nbytes = int(np.prod(self.shape)) * self.dtype.itemsize
        stride = self.nbytes if stride is None else stride
        self._h = _lib().pf_open(path.encode(), self.nbytes,
                                 first_offset, stride, n_slots)
        if not self._h:
            raise OSError(f"prefetcher cannot open {path}")

    def request(self, rec: int) -> None:
        _lib().pf_request(self._h, rec)

    def ready(self, rec: int) -> bool:
        return bool(_lib().pf_ready(self._h, rec))

    def get(self, rec: int) -> np.ndarray:
        out = np.empty(self.shape, self.dtype)
        _lib().pf_get(self._h, rec,
                      out.ctypes.data_as(ctypes.c_void_p))
        return out

    @property
    def stats(self):
        return {"hits": int(_lib().pf_hits(self._h)),
                "misses": int(_lib().pf_misses(self._h))}

    def close(self):
        if self._h:
            _lib().pf_close(self._h)
            self._h = None
