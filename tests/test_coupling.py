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


def test_wave_imports_drive_bbl_and_wec():
    """Imported Hwave/Dwave/Lwave/Pwave must reach the BBL bottom
    stress and the WEC vortex force through the coupling seam
    (mct_roms_swan.h field exchange; the VERDICT round-3 finding was
    that the seam declared but dropped these fields)."""
    from roms_tpu.core.bbl import BBLConfig, initial_bbl, \
        make_ssw_bbl_fn
    from roms_tpu.core.wec import make_wec_fn

    cfg = upwelling.make_config(dtype="float64")
    grid = upwelling.make_grid(cfg)
    shp = cfg.shape2d

    def calm_waves(time):
        # the ocean's own (uncoupled) wave state: tiny waves
        return (jnp.full(shp, 0.01), jnp.zeros(shp),
                jnp.full(shp, 8.0))

    def calm_waves_bbl(time):
        return (jnp.full(shp, 0.01), jnp.zeros(shp),
                jnp.full(shp, 8.0))

    def build():
        return Model(
            cfg, grid, upwelling.make_forcing_fn(cfg, grid),
            vmix_fn=upwelling.make_vmix_fn(cfg),
            bbl_fn=make_ssw_bbl_fn(cfg, BBLConfig(), grid,
                                   calm_waves_bbl),
            wec_fn=make_wec_fn(cfg, grid, calm_waves))

    s0 = upwelling.make_initial(cfg, grid)
    # give the flow some bottom velocity so stress is nonzero
    s0 = s0._replace(u=s0.u + 0.05, bbl=initial_bbl(cfg))

    ocean = CoupledOcean(build())
    imp_calm = ImportState(Hwave=jnp.full(shp, 0.01),
                           Dwave=jnp.zeros(shp),
                           Lwave=jnp.full(shp, 40.0),
                           Pwave=jnp.full(shp, 8.0))
    s_calm, _ = ocean.run_window(s0, imp_calm, 3)

    ocean2 = CoupledOcean(build())
    imp_storm = ImportState(Hwave=jnp.full(shp, 2.5),
                            Dwave=jnp.zeros(shp),
                            Lwave=jnp.full(shp, 40.0),
                            Pwave=jnp.full(shp, 8.0))
    s_storm, _ = ocean2.run_window(s0, imp_storm, 3)

    du = np.abs(np.asarray(s_storm.u) - np.asarray(s_calm.u)).max()
    assert du > 1e-8, "imported wave fields had no effect"

    # and the coupled run with storm waves equals an uncoupled run
    # whose wave_fn returns the same storm fields (same code path)
    def storm_waves(time):
        return (jnp.full(shp, 2.5), jnp.zeros(shp),
                jnp.full(shp, 40.0))

    def storm_waves_bbl(time):
        return (jnp.full(shp, 2.5), jnp.zeros(shp),
                jnp.full(shp, 8.0))

    m_ref = Model(
        cfg, grid, upwelling.make_forcing_fn(cfg, grid),
        vmix_fn=upwelling.make_vmix_fn(cfg),
        bbl_fn=make_ssw_bbl_fn(cfg, BBLConfig(), grid,
                               storm_waves_bbl),
        wec_fn=make_wec_fn(cfg, grid, storm_waves))
    # imported forcing is None -> model forcing; only waves differ
    s_ref = s0
    for _ in range(3):
        s_ref = m_ref.step(s_ref)
    np.testing.assert_allclose(np.asarray(s_storm.u),
                               np.asarray(s_ref.u), rtol=0, atol=1e-12)
