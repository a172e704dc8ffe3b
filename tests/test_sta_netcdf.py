"""NetCDF STA stream + reference stations-deck parsing."""

import os
import tempfile

import numpy as np
import pytest
from scipy.io import netcdf_file

from roms_tpu.core import stepping
from roms_tpu.functionals import upwelling
from roms_tpu.io.sta_netcdf import StationWriter, parse_stations_in

DECK = "/root/reference/ROMS/External/stations_test_head.in"


@pytest.mark.skipif(not os.path.exists(DECK),
                    reason="reference stations deck unavailable")
def test_parse_reference_stations_deck():
    d = parse_stations_in(DECK)
    assert d["nstation"] == 11
    assert len(d["pos"]) == 11
    assert d["pos"][0] == (1, 0, 29.0, 3.0)
    assert d["sout"].get("idFsur") is True


def test_station_stream_matches_fields():
    cfg = upwelling.make_config(Lm=16, Mm=18, N=8)
    grid = upwelling.make_grid(cfg)
    s = upwelling.make_initial(cfg, grid)
    m = stepping.Model(cfg, grid,
                       forcing_fn=upwelling.make_forcing_fn(cfg, grid))
    stations = [(3, 4), (9, 8), (15, 12)]
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "sta.nc")
        w = StationWriter(path, cfg, stations,
                          fields=("zeta", "temp", "u"))
        for _ in range(3):
            s = m.step(s)
            w.write(s)
        w.close()
        f = netcdf_file(path, "r", mmap=False)
        assert f.variables["zeta"].shape == (3, 3)
        assert f.variables["temp"].shape == (3, cfg.N, 3)
        got = np.asarray(f.variables["zeta"][2])
        want = np.asarray(s.zeta)[[3, 9, 15], [4, 8, 12]]
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=1e-6)
        assert list(f.variables["Jpos"][:]) == [3, 9, 15]
        f.close()


@pytest.mark.skipif(not os.path.exists(DECK),
                    reason="reference stations deck unavailable")
def test_outputmanager_sta_stream():
    """SPOSNAM + NSTA in the main deck drive the STA stream, with the
    stations deck's own Sout switches selecting the fields."""
    from roms_tpu.io.output import OutputManager
    cfg = upwelling.make_config(Lm=60, Mm=28, N=6)
    grid = upwelling.make_grid(cfg)
    s = upwelling.make_initial(cfg, grid)
    m = stepping.Model(cfg, grid,
                       forcing_fn=upwelling.make_forcing_fn(cfg, grid))
    with tempfile.TemporaryDirectory() as d:
        om = OutputManager(cfg, grid,
                           {"NSTA": 2, "SPOSNAM": DECK,
                            "STANAME": "sta.nc"}, outdir=d)
        assert om.sta is not None
        for _ in range(4):
            s = m.step(s)
            om.step(s)
        om.close()
        f = netcdf_file(os.path.join(d, "sta.nc"), "r", mmap=False)
        assert f.variables["zeta"].shape[0] == 2   # steps 2, 4
        assert f.variables["zeta"].shape[1] == 11  # NSTATION
        f.close()
