"""End-to-end reference-user workflow: the REAL UPWELLING input deck
(ROMS/External/roms_upwelling.in) drives config, model, and output
streams — the full inp_par -> initial -> main3d -> output chain of
Drivers/nl_roms.h, on a scaled-down grid."""

import os
import tempfile

import numpy as np
import pytest
from scipy.io import netcdf_file

DECK = "/root/reference/ROMS/External/roms_upwelling.in"


@pytest.mark.skipif(not os.path.exists(DECK),
                    reason="reference input deck not available")
def test_upwelling_deck_end_to_end():
    from roms_tpu.core import stepping
    from roms_tpu.functionals import upwelling
    from roms_tpu.io.output import OutputManager
    from roms_tpu.io.roms_in import check_keywords, parse_roms_in, \
        to_config

    params = parse_roms_in(DECK)
    assert check_keywords(params) == []     # full vocabulary coverage

    # deck physics on a scaled grid (the deck's own Lm/Mm would be
    # 41x80; shrink for test wall-time, keep everything else)
    import dataclasses
    cfg = to_config(params, Lm=16, Mm=18, dtype="float64")
    cfg = cfg.replace(vert=dataclasses.replace(cfg.vert, N=8))
    assert cfg.dt == 300.0                  # DT == 300.0d0
    assert cfg.ndtfast == 30                # NDTFAST == 30
    grid = upwelling.make_grid(cfg)
    state = upwelling.make_initial(cfg, grid)
    model = stepping.Model(
        cfg, grid, forcing_fn=upwelling.make_forcing_fn(cfg, grid),
        vmix_fn=upwelling.make_vmix_fn(cfg))

    # deck-driven output (scaled cadences)
    params.update({"NHIS": 3, "NAVG": 3, "NRST": 6, "NINFO": 0})
    with tempfile.TemporaryDirectory() as d:
        om = OutputManager(cfg, grid, params, outdir=d,
                           initial_state=state)
        for _ in range(6):
            state = model.step(state)
            om.step(state)
        om.close()

        z = np.asarray(state.zeta)
        assert np.isfinite(z).all()
        # x-uniform setup must stay x-uniform to roundoff
        assert np.abs(z - z.mean(axis=1, keepdims=True)).max() < 1e-12

        his = netcdf_file(os.path.join(d, params["HISNAME"]), "r",
                          mmap=False)
        # deck's Hout switches: zeta/u/v/ubar/vbar/temp/salt + derived
        # w/omega/rho all on (roms_upwelling.in Hout block)
        for name in ("zeta", "u", "v", "ubar", "vbar", "temp", "salt",
                     "w", "omega", "rho"):
            assert name in his.variables, name
        assert his.variables["zeta"].shape[0] == 2
        his.close()

        rst = netcdf_file(os.path.join(d, params["RSTNAME"]), "r",
                          mmap=False)
        assert int(rst.variables["nsteps"][0]) == 6
        rst.close()
