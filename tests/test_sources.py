"""Point-source (river) tests: LwSrc volume + tracer injection."""

import numpy as np

from roms_tpu.core.sources import make_point_sources
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


def test_river_volume_and_dilution():
    cfg = upwelling.make_config(Lm=16, Mm=18, N=8, dtype="float64")
    grid = upwelling.make_grid(cfg)
    st = upwelling.make_initial(cfg, grid)
    src = make_point_sources(cfg, [(9, 8)], [500.0],
                             tsrc_values=[(14.0, 5.0)])
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              upwelling.make_vmix_fn(cfg), sources=src)
    s = m.run(st, 30)
    a = np.asarray
    # volume budget: added Q*t spread over the basin area
    area = float(np.sum(1.0 / a(grid.pm * grid.pn)[1:-1, 1:-1]))
    dz = a(s.zeta)[1:-1, 1:-1].mean() - a(st.zeta)[1:-1, 1:-1].mean()
    expect = 500.0 * 30 * cfg.dt / area
    assert abs(dz - expect) < 0.05 * expect
    # low-salinity river water dilutes the source cell
    S = a(s.t[1])
    assert S[:, 9, 8].min() < 34.0
    assert np.isfinite(S).all()
    # far field remains at ambient salinity
    assert abs(S[:, 3, 3].mean() - 35.0) < 0.01
