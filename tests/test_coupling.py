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


def test_two_component_coupled_run():
    """Real multi-component run through the NUOPC-style seam: a slab
    atmosphere exchanging heat with the ocean every window.  The
    air-sea coupling must transfer heat in the right direction (warm
    air warms the ocean surface; the ocean cools the air toward
    balance) and conserve the exchanged energy sign conventions."""
    import jax.numpy as jnp
    import numpy as np
    from roms_tpu.core.coupling import (CoupledDriver, CoupledOcean,
                                        SlabAtmosphere)
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import upwelling

    cfg = upwelling.make_config(Lm=12, Mm=12, N=6, dtype="float64")
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    model = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  vmix_fn=upwelling.make_vmix_fn(cfg))
    shp = cfg.shape2d
    sst0 = float(np.asarray(s0.t[0][-1]).mean())
    # hot radiative equilibrium -> atmosphere stays warmer than SST
    atmos = SlabAtmosphere(cfg, Teq=jnp.full(shp, sst0 + 10.0),
                           sustr=jnp.zeros(shp),
                           svstr=jnp.zeros(shp))
    Ta0 = jnp.full(shp, sst0 + 8.0)
    driver = CoupledDriver(CoupledOcean(model), atmos,
                           steps_per_window=2)
    s1, Ta1, exports = driver.run(s0, Ta0, n_windows=6)
    a = np.asarray
    assert np.isfinite(a(s1.t)).all() and np.isfinite(a(Ta1)).all()
    # warm air heats the ocean surface
    assert a(exports.sst).mean() > sst0
    # the exchange cools the air below pure radiative equilibrium
    assert a(Ta1).mean() < sst0 + 10.0
    # exports carry the full contract
    for f in ("sst", "ssh", "usur", "ubar"):
        assert np.asarray(getattr(exports, f)).shape == shp
