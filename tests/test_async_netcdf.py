"""Native async record sink (native/async_sink.cpp) behind
AsyncHistoryWriter: output must be bit-identical to the synchronous
scipy writer."""

import os

import numpy as np
import pytest
from scipy.io import netcdf_file

from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling
from roms_tpu.io.async_netcdf import AsyncHistoryWriter, _load_lib
from roms_tpu.io.netcdf import HistoryWriter

needs_lib = pytest.mark.skipif(_load_lib() is None,
                               reason="native sink not built")


@needs_lib
def test_async_matches_sync(tmp_path):
    cfg = upwelling.make_config(Lm=12, Mm=14, N=6, dtype="float64")
    grid = upwelling.make_grid(cfg)
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              vmix_fn=upwelling.make_vmix_fn(cfg))
    s = upwelling.make_initial(cfg, grid)

    p_sync = os.path.join(tmp_path, "sync.nc")
    p_async = os.path.join(tmp_path, "async.nc")
    ws = HistoryWriter(p_sync, cfg, grid)
    wa = AsyncHistoryWriter(p_async, cfg, grid)
    for _ in range(3):
        s = m.run(s, 2)
        ws.write(s)
        wa.write(s)
    ws.close()
    wa.close()            # drains the queue + fsync

    fs = netcdf_file(p_sync, "r", mmap=False)
    fa = netcdf_file(p_async, "r", mmap=False)
    assert fa.variables["zeta"].shape == fs.variables["zeta"].shape
    for name in ("ocean_time", "zeta", "u", "temp"):
        a = np.asarray(fa.variables[name][:])
        b = np.asarray(fs.variables[name][:])
        np.testing.assert_array_equal(a, b)
    fs.close()
    fa.close()


@needs_lib
def test_async_readback_single_record(tmp_path):
    cfg = upwelling.make_config(Lm=12, Mm=14, N=6, dtype="float64")
    grid = upwelling.make_grid(cfg)
    s = upwelling.make_initial(cfg, grid)
    p = os.path.join(tmp_path, "nb.nc")
    w = AsyncHistoryWriter(p, cfg, grid)
    w.write(s)
    w.close()
    f = netcdf_file(p, "r", mmap=False)
    assert f.variables["zeta"].shape[0] == 1
    np.testing.assert_allclose(np.asarray(f.variables["temp"][0]),
                               np.asarray(s.t[0], np.float32))
    f.close()


def test_native_forcing_prefetcher(tmp_path):
    """C++ record prefetcher: async staging ahead of the clock, exact
    payloads, hit accounting."""
    import time
    import numpy as np
    from roms_tpu.io.prefetch import RecordPrefetcher
    shape = (8, 16)
    nrec = 6
    recs = [np.random.default_rng(k).normal(size=shape)
            .astype(np.float64) for k in range(nrec)]
    path = str(tmp_path / "forcing.bin")
    with open(path, "wb") as f:
        for r in recs:
            f.write(r.tobytes())
    pf = RecordPrefetcher(path, shape, np.float64, first_offset=0)
    # prefetch ahead, then read in order
    pf.request(0)
    pf.request(1)
    time.sleep(0.05)
    for k in range(nrec):
        if k + 2 < nrec:
            pf.request(k + 2)           # stay two records ahead
        got = pf.get(k)
        np.testing.assert_array_equal(got, recs[k])
    st = pf.stats
    assert st["hits"] + st["misses"] == nrec
    assert st["hits"] >= 1              # staged reads were zero-wait
    pf.close()
