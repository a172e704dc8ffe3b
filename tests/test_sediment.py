"""Suspended sediment + bed exchange tests (Sediment/sed_fluxes.F,
sed_settling.F)."""

import jax.numpy as jnp
import numpy as np

from roms_tpu.core.sediment import SedConfig, initial_sed, make_sed_hook
from roms_tpu.core.state import initial_state
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


def _setup(**sed_kw):
    cfg = upwelling.make_config(Lm=14, Mm=16, N=8,
                                dtype="float64").replace(NT=3)
    grid = upwelling.make_grid(cfg)
    st0 = upwelling.make_initial(cfg, grid)
    sedc = SedConfig(nsed=1, **sed_kw)
    mud = jnp.full_like(st0.t[0], 0.01)
    t3 = jnp.concatenate([st0.t, mud[None]], axis=0)
    st = initial_state(cfg, grid, zeta=st0.zeta, t=t3,
                       sed=initial_sed(cfg, sedc, bed_mass0=1.0))
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              upwelling.make_vmix_fn(cfg),
              sed_fn=make_sed_hook(cfg, sedc, grid))
    return cfg, grid, st, m


def _totals(s):
    susp = np.asarray(s.t[2] * s.Hz)[:, 1:-1, 1:-1].sum(0)
    bed = np.asarray(s.sed.bed_mass[0])[1:-1, 1:-1]
    return susp, bed


class TestSediment:
    def test_total_mass_conserved(self):
        cfg, grid, st, m = _setup(Wsed=(1.0,), Erate=(5e-4,),
                                  tau_ce=(2e-5,))
        s = m.run(st, 40)
        susp0, bed0 = _totals(st)
        susp1, bed1 = _totals(s)
        tot0 = susp0.mean() + bed0.mean()
        tot1 = susp1.mean() + bed1.mean()
        assert abs(tot1 - tot0) < 1e-10 * tot0
        assert np.asarray(s.t[2]).min() > -1e-12
        assert np.asarray(s.sed.bed_mass).min() >= 0.0

    def test_settling_deposits_in_quiet_water(self):
        """High tau_ce (no erosion): settling empties the water column
        into the bed."""
        cfg, grid, st, m = _setup(Wsed=(10.0,), Erate=(0.0,),
                                  tau_ce=(10.0,))
        s = m.run(st, 60)
        susp0, bed0 = _totals(st)
        susp1, bed1 = _totals(s)
        assert susp1.mean() < 0.2 * susp0.mean()
        assert bed1.mean() > bed0.mean()
