"""Multi-layer sediment bed stratigraphy (sed_bed.F / sedbed_mod.h)."""

import jax.numpy as jnp
import numpy as np

from roms_tpu.core.sed_bed import (BedState, bed_fractions, initial_bed,
                                   sed_bed_update, total_thickness)
from roms_tpu.core.sediment import SedConfig
from roms_tpu.functionals import upwelling


def _setup(nbed=4):
    cfg = upwelling.make_config(Lm=8, Mm=8, N=4, dtype="float64")
    sed = SedConfig(nsed=2, Wsed=(1.0, 0.5), Erate=(5e-5, 5e-5),
                    tau_ce=(0.05, 0.05), Srho=(2650.0, 2650.0),
                    d50=(2e-4, 1e-4))
    bed = initial_bed(cfg, sed, nbed=nbed)
    return cfg, sed, bed


def test_mass_conservation_under_exchange():
    cfg, sed, bed = _setup()
    shp = (sed.nsed,) + cfg.shape2d
    ero = jnp.full(shp, 2e-4)
    dep = jnp.full(shp, 1e-4)
    tau = jnp.full(cfg.shape2d, 0.01)
    m0 = float(jnp.sum(bed.mass))
    b1 = sed_bed_update(cfg, sed, bed, ero, dep, tau, time=10 * cfg.dt)
    m1 = float(jnp.sum(b1.mass))
    # net flux out of the bed = sum(ero - dep) per column
    expected = m0 - float(jnp.sum(ero - dep))
    assert abs(m1 - expected) < 1e-10 * m0
    assert b1.mass.shape == bed.mass.shape      # Nbed preserved
    assert float(b1.thick.min()) >= 0.0


def test_new_surface_layer_on_deposition():
    cfg, sed, bed = _setup()
    shp = (sed.nsed,) + cfg.shape2d
    ero = jnp.zeros(shp)
    dep = jnp.full(shp, 5e-3)          # strong deposition
    tau = jnp.zeros(cfg.shape2d)
    t = 10 * cfg.dt
    b1 = sed_bed_update(cfg, sed, bed, ero, dep, tau, time=t)
    # the new surface layer carries the current time as its age
    assert np.allclose(np.asarray(b1.age[0]), t)
    top = np.asarray(b1.mass[0]).sum(axis=0)
    assert (top > 0).all()
    # mass conserved (deposition + any active-layer entrainment both
    # only move mass between layers)
    assert abs(float(jnp.sum(b1.mass))
               - (float(jnp.sum(bed.mass)) + float(jnp.sum(dep)))) \
        < 1e-10
    # the fresh deposit is distinguishable: surface age is newer than
    # every deeper layer
    assert (np.asarray(b1.age[0]) >= np.asarray(b1.age[1:]).max(axis=0)
            - 1e-9).all()


def test_active_layer_entrainment_conserves_mass():
    cfg, sed, bed = _setup()
    # thin surface layer: force entrainment with a large stress
    mass = bed.mass.at[0].set(1e-4)
    bed = bed._replace(mass=mass,
                       thick=bed.thick.at[0].set(1e-4 / 2650.0 / 0.5))
    shp = (sed.nsed,) + cfg.shape2d
    zero = jnp.zeros(shp)
    tau = jnp.full(cfg.shape2d, 0.5)   # strong stress -> thick za
    m0 = float(jnp.sum(bed.mass))
    b1 = sed_bed_update(cfg, sed, bed, zero, zero, tau, time=cfg.dt)
    m1 = float(jnp.sum(b1.mass))
    assert abs(m1 - m0) < 1e-9 * max(m0, 1.0)
    # surface layer grew (entrained from below)
    assert float(b1.mass[0].sum()) > float(bed.mass[0].sum())
    # fractions normalized
    fr = np.asarray(bed_fractions(sed, b1)).sum(axis=1)
    assert np.allclose(fr[np.asarray(b1.mass.sum(axis=1)) > 1e-12], 1.0)
    assert np.isfinite(np.asarray(total_thickness(b1))).all()
