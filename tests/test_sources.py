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


def test_luvsrc_horizontal_face_river():
    """LuvSrc river through a u-face: raises sea level, imports the
    riverine tracer (freshens salt) at the mouth."""
    import jax.numpy as jnp
    import numpy as np
    from roms_tpu.core.sources import make_point_sources
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import upwelling
    cfg = upwelling.make_config(Lm=16, Mm=16, N=6, dtype="float64")
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    # river entering through the coastal v-face at (j=1, i=8) — the
    # face between the (closed) southern boundary ring and the first
    # interior cell, the reference's standard river placement
    # (UPWELLING is EW-periodic, so u-faces have no coast); Q=300 m3/s,
    # fresh (S=0) and warm
    src = make_point_sources(cfg, [(1, 8)], [300.0],
                             tsrc_values=[(20.0, 0.0)],
                             directions=["v"])
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              vmix_fn=upwelling.make_vmix_fn(cfg), sources=src)
    m0 = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
               vmix_fn=upwelling.make_vmix_fn(cfg))
    n = 20
    s = m.run(s0, n)
    sref = m0.run(s0, n)
    a = np.asarray
    # volume added ~= Q * t (integrate zeta difference)
    omn = 1.0 / (a(grid.pm) * a(grid.pn))
    dvol = ((a(s.zeta) - a(sref.zeta))[1:-1, 1:-1]
            * omn[1:-1, 1:-1]).sum()
    expect = 300.0 * n * cfg.dt
    assert abs(dvol - expect) < 0.05 * expect, (dvol, expect)
    # the mouth cell freshened relative to the no-river run
    assert a(s.t)[1, :, 1, 8].mean() < a(sref.t)[1, :, 1, 8].mean()
    assert np.isfinite(a(s.t)).all()
