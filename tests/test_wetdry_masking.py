"""Wetting-and-drying (wetdry.F) and land/sea masking tests."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from roms_tpu.config import BottomDragConfig, BoundaryConfig
from roms_tpu.core.main2d import Model2D, initial_state2d
from roms_tpu.core.stepping import Model
from roms_tpu.core.state import initial_state
from roms_tpu.functionals import idealized as ia, upwelling
from roms_tpu.grid.grid import build_grid


class TestWetDry:
    def test_sloping_beach_stays_wet_limited(self):
        """Sloshing over a beach that is partly above sea level: depth
        never drops below Dcrit and nothing blows up."""
        cfg = ia.soliton_config(Lm=60, Mm=6, dt=2.0).replace(
            g=9.81, wetdry=True, Dcrit=0.1, rho0=1025.0,
            drag=BottomDragConfig(kind="quadratic", rdrg2=3e-3),
            bc=BoundaryConfig())
        Mj, Li = cfg.shape2d
        x = np.arange(Li)
        h1 = -0.5 + 10.5 * x / (Li - 1)        # negative = dry land
        h = np.broadcast_to(h1[None, :], (Mj, Li)).copy()
        pm = np.full((Mj, Li), 1.0 / 500.0)
        grid = build_grid(cfg, h=h, pm=pm, pn=pm, f=np.zeros((Mj, Li)))
        zeta0 = np.maximum(0.2 * np.cos(np.pi * x / (Li - 1))[None, :]
                           * np.ones((Mj, 1)), -h + cfg.Dcrit)
        m = Model2D(cfg, grid)
        s = m.run(initial_state2d(cfg, zeta=zeta0), 400)
        z = np.asarray(s.zeta)
        D = z + h
        assert np.isfinite(z).all()
        assert D[1:-1, 1:-1].min() >= cfg.Dcrit - 1e-9
        assert np.abs(np.asarray(s.ubar)).max() < 2.0


class TestMasking:
    def test_island_blocks_flow(self):
        """Land mask (set_masks.F semantics): an island in the UPWELLING
        channel must carry zero velocity at its faces and not generate
        NaNs."""
        cfg = upwelling.make_config(Lm=24, Mm=24, N=6, dtype="float64")
        grid0 = upwelling.make_grid(cfg)
        Mj, Li = cfg.shape2d
        rmask = np.ones((Mj, Li))
        rmask[10:15, 10:14] = 0.0                  # island
        import numpy as _np
        grid = build_grid(cfg, h=_np.asarray(grid0.h),
                          pm=_np.asarray(grid0.pm),
                          pn=_np.asarray(grid0.pn),
                          f=_np.asarray(grid0.f), rmask=rmask)
        state = upwelling.make_initial(cfg, grid)
        model = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                      upwelling.make_vmix_fn(cfg))
        s = model.run(state, 30)
        a = np.asarray
        assert np.isfinite(a(s.u)).all() and np.isfinite(a(s.zeta)).all()
        # velocities on masked faces are exactly zero
        um = a(grid.umask)
        assert np.abs(a(s.u) * (1 - um)[None]).max() == 0.0
        assert np.abs(a(s.ubar) * (1 - um)).max() == 0.0
        # flow still develops in the open channel
        assert np.abs(a(s.u)).max() > 1e-3


def test_wetdry_3d_sloping_beach():
    """3D wet/dry coupling: a sloping beach with cells drier than
    Dcrit stays stable; baroclinic momentum vanishes on dry faces and
    total depth never goes below Dcrit."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from roms_tpu import config as C
    from roms_tpu.core.stepping import Model
    from roms_tpu.core.wetdry import compute_wet_masks
    from roms_tpu.functionals import idealized as ia
    from roms_tpu.functionals import upwelling
    from roms_tpu.grid.grid import build_grid
    cfg = upwelling.make_config(Lm=24, Mm=12, N=6, dtype="float64")
    cfg = cfg.replace(wetdry=True, Dcrit=0.1,
                      bc=C.BoundaryConfig())      # closed basin
    Mj, Li = cfg.shape2d
    # beach: depth ramps from 10 m to -0.5 m (dry land) eastward
    x = np.linspace(0.0, 1.0, Li)[None, :] * np.ones((Mj, 1))
    h = 10.0 - 13.0 * x   # last ~3 columns are land (h<0)
    grid = build_grid(cfg, h=h, pm=np.full((Mj, Li), 1e-3),
                      pn=np.full((Mj, Li), 1e-3),
                      f=np.zeros((Mj, Li)))
    from roms_tpu.core.state import initial_state
    from roms_tpu.core.wetdry import clamp_dry_zeta
    # initialize dry cells at the critical depth (the reference's
    # initial wet/dry adjustment)
    zeta0 = clamp_dry_zeta(cfg, grid, jnp.zeros(cfg.shape2d))
    s0 = initial_state(cfg, grid, zeta=zeta0,
                       t=upwelling.make_initial(cfg, grid).t)
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              vmix_fn=upwelling.make_vmix_fn(cfg))
    s = m.run(s0, 15)
    a = np.asarray
    interior = np.s_[1:-1, 1:-1]
    assert np.isfinite(a(s.zeta)).all() and np.isfinite(a(s.u)).all()
    depth = (a(s.zeta) + h)[interior]
    # dry zone maintained at (or within a hair of) the critical depth
    assert depth.min() > 0.0
    dry = depth <= cfg.Dcrit * 1.01
    assert dry.any()                    # the shallow zone indeed dried
    # no 3D flow inside the dry region (away from the wetting front)
    wm = compute_wet_masks(cfg, grid, s.zeta)
    u = a(s.u)[:, 1:-1, 1:-1]
    dry_u = np.asarray(wm.umask_wet)[interior] == 0.0
    assert dry_u.any()                  # interior fully-dry faces exist
    assert np.abs(u[:, dry_u]).max() < 1e-10
