"""Per-tracer advection registry (tadv.F:146-180): mixed schemes in one
run — e.g. MPDATA for a bio-like tracer + UPSTREAM3 for temperature —
must be expressible and consistent with uniform-scheme runs."""

import numpy as np

from roms_tpu import config as C
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


def _run(cfg, nsteps=3):
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              vmix_fn=upwelling.make_vmix_fn(cfg))
    return m.run(s0, nsteps)


def test_mixed_scheme_run():
    base = upwelling.make_config(dtype="float64")
    mixed = base.replace(hadv_t=(C.UPSTREAM3, C.MPDATA),
                         vadv_t=(base.vadv, C.MPDATA))
    u3 = _run(base)
    mx = _run(mixed)
    # temperature (tracer 0) advects with the same scheme in both runs;
    # salt in the mixed run moved to monotone MPDATA.  The momentum/zeta
    # paths see identical physics until salinity feeds back through the
    # linear EOS (Scoef=0 for UPWELLING -> no feedback at all).
    np.testing.assert_allclose(np.asarray(mx.t[0]), np.asarray(u3.t[0]),
                               atol=1e-12)
    d_salt = np.abs(np.asarray(mx.t[1]) - np.asarray(u3.t[1])).max()
    assert np.isfinite(np.asarray(mx.t)).all()
    # UPWELLING salt is uniform 35 -> every scheme preserves it exactly;
    # perturb to see the schemes actually differ
    grid = upwelling.make_grid(base)
    s0 = upwelling.make_initial(base, grid)
    t = np.array(s0.t)
    t[1, :, 30:50, 10:30] += 1.0
    import jax.numpy as jnp
    s0p = s0._replace(t=jnp.asarray(t))
    m_u3 = Model(base, grid, upwelling.make_forcing_fn(base, grid),
                 vmix_fn=upwelling.make_vmix_fn(base))
    m_mx = Model(mixed, grid, upwelling.make_forcing_fn(mixed, grid),
                 vmix_fn=upwelling.make_vmix_fn(mixed))
    a = m_u3.run(s0p, 3)
    b = m_mx.run(s0p, 3)
    np.testing.assert_allclose(np.asarray(b.t[0]), np.asarray(a.t[0]),
                               atol=1e-12)
    assert np.abs(np.asarray(b.t[1]) - np.asarray(a.t[1])).max() > 1e-10
    # MPDATA salt stays monotone (no new extrema beyond initial range)
    assert float(np.asarray(b.t[1]).max()) <= 36.0 + 1e-9


def test_registry_fallback():
    cfg = upwelling.make_config()
    assert cfg.tracer_hadv(0) == cfg.hadv
    cfg2 = cfg.replace(hadv_t=(C.CENTERED4,))
    assert cfg2.tracer_hadv(0) == C.CENTERED4
    assert cfg2.tracer_hadv(1) == cfg.hadv     # beyond tuple -> default


def test_roms_in_per_tracer_parse():
    from roms_tpu.io import roms_in
    text = """
Lm == 16
Mm == 16
   Hadvection == U3       \\                     ! temperature
                 MPDATA                          ! salinity
   Vadvection == C4       \\
                 MPDATA
"""
    params = roms_in.parse_roms_in(text)
    assert params["Hadvection"] == ["U3", "MPDATA"]
    cfg = roms_in.to_config(params)
    assert cfg.hadv_t == (C.UPSTREAM3, C.MPDATA)
    assert cfg.vadv_t == (C.CENTERED4, C.MPDATA)
    assert cfg.tracer_hadv(0) == C.UPSTREAM3
    assert cfg.tracer_hadv(1) == C.MPDATA
