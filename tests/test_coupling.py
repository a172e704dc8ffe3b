"""ESMF/NUOPC-style coupling seam (core/coupling.py): imported surface
fields drive the ocean; exports reflect the updated state; changing
imports between windows takes effect (no trace staleness)."""

import jax.numpy as jnp
import numpy as np

from roms_tpu.core.coupling import CoupledOcean, ImportState
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


def test_coupled_windows_respond_to_imports():
    cfg = upwelling.make_config(dtype="float64")
    grid = upwelling.make_grid(cfg)
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              vmix_fn=upwelling.make_vmix_fn(cfg))
    ocean = CoupledOcean(m)
    s = upwelling.make_initial(cfg, grid)
    shp = cfg.shape2d

    # window 1: strong eastward stress
    imp1 = ImportState(sustr=jnp.full(shp, 1.0e-4),
                       svstr=jnp.zeros(shp))
    s, ex1 = ocean.run_window(s, imp1, 10)
    assert np.isfinite(np.asarray(ex1.ssh)).all()
    u1 = float(np.asarray(ex1.usur).mean())
    assert u1 > 0.0                     # pushed eastward

    # window 2: reversed stress must take effect (same jit trace)
    imp2 = ImportState(sustr=jnp.full(shp, -1.0e-4),
                       svstr=jnp.zeros(shp))
    s, ex2 = ocean.run_window(s, imp2, 20)
    u2 = float(np.asarray(ex2.usur).mean())
    assert u2 < u1                      # decelerated/reversed

    # exports carry the surface state
    np.testing.assert_allclose(np.asarray(ex2.sst),
                               np.asarray(s.t[0][-1]))
