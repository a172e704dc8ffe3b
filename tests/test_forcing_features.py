"""Tides, climatology nudging, and sponge tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from roms_tpu.core.stepping import Model
from roms_tpu.core import climatology as clm_mod
from roms_tpu.core.tides import (PERIODS_H, TidalEdge, TidalForcing,
                                 make_tidal_obc_fn)
from roms_tpu.functionals import kelvin, upwelling


class TestTides:
    def test_m2_tide_through_flather(self):
        """Drive the KELVIN channel with an M2 harmonic through the
        tidal-OBC synthesis path instead of the hand-rolled data."""
        cfg = kelvin.make_config(Lm=30, Mm=16, N=6)
        grid = kelvin.make_grid(cfg)
        state = kelvin.make_initial(cfg, grid)
        Mj = cfg.shape2d[0]
        amp = 0.5 * np.exp(-np.arange(Mj) / 10.0)
        tides = TidalForcing(
            period=jnp.asarray([PERIODS_H["M2"] * 3600.0]),
            zeta={"west": TidalEdge(amp=jnp.asarray(amp)[None],
                                    phase=jnp.zeros((1, Mj)))},
            ubar={"west": TidalEdge(
                amp=jnp.asarray(amp * np.sqrt(9.81 / 100.0))[None],
                phase=jnp.full((1, Mj), np.pi / 2))},
            vbar={})
        model = Model(cfg, grid, kelvin.make_forcing_fn(cfg, grid),
                      obc_fn=make_tidal_obc_fn(tides))
        s = model.run(state, 40)
        z = np.asarray(s.zeta)
        assert np.isfinite(z).all()
        assert 0.02 < np.abs(z[1:-1, 1:-1]).max() < 1.0


class TestClimatology:
    def test_tracer_nudging_pulls_to_clm(self):
        cfg = upwelling.make_config(Lm=12, Mm=12, N=6, dtype="float64")
        grid = upwelling.make_grid(cfg)
        state = upwelling.make_initial(cfg, grid)
        tclm = state.t + 1.0        # target 1 degree warmer everywhere

        def clm_fn(time):
            return {"tclm": tclm, "Tnudgcof": 1.0 / (10 * cfg.dt)}

        m0 = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                   upwelling.make_vmix_fn(cfg))
        m1 = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                   upwelling.make_vmix_fn(cfg), clm_fn=clm_fn)
        s0 = m0.run(state, 10)
        s1 = m1.run(state, 10)
        d0 = float(np.abs(np.asarray(s0.t[0] - tclm[0])).mean())
        d1 = float(np.abs(np.asarray(s1.t[0] - tclm[0])).mean())
        assert d1 < d0          # nudged run is closer to climatology

    def test_sponge_profile(self):
        cfg = upwelling.make_config(Lm=20, Mm=20, N=4)
        amp = np.asarray(clm_mod.sponge_profile(cfg, width=4, factor=5.0,
                                                edges=("west",)))
        assert amp[10, 0] == 5.0
        assert amp[10, 10] == 1.0
        grid = upwelling.make_grid(cfg)
        g2 = clm_mod.apply_sponge(grid, jnp.asarray(amp))
        assert float(g2.visc2_r[10, 0]) == pytest.approx(
            5.0 * float(grid.visc2_r[10, 10]))


def test_cool_skin_and_coare35():
    """COOL_SKIN (bulk_flux.F:894-938): the molecular skin cools the
    interface, reducing the sea-air contrast and hence the upward
    turbulent fluxes; COARE 3.5 Charnock changes the drag at moderate
    winds."""
    import jax.numpy as jnp
    import numpy as np
    from roms_tpu.core import bulk_flux as bf
    from roms_tpu.functionals import benchmark
    cfg = benchmark.make_config(Lm=32, Mm=16, N=4, dtype="float64")
    shp = cfg.shape2d
    atm = bf.AtmState(Uwind=jnp.full(shp, 8.0), Vwind=jnp.zeros(shp),
                      Tair=jnp.full(shp, 10.0), Hair=jnp.full(shp, 0.8),
                      Pair=jnp.full(shp, 1013.0),
                      cloud=jnp.full(shp, 0.3),
                      srflx=jnp.full(shp, 300.0 / (1025 * 3985)),
                      rain=jnp.zeros(shp))
    sst, sss = jnp.full(shp, 15.0), jnp.full(shp, 35.0)
    rs = jnp.zeros(shp)
    base = bf.bulk_flux(cfg, atm, sst, sss, rs)
    skin = bf.bulk_flux(cfg, atm, sst, sss, rs, cool_skin=True)
    c35 = bf.bulk_flux(cfg, atm, sst, sss, rs, coare35=True)
    # upward (negative) fluxes weaken with the cool skin
    assert abs(float(np.asarray(skin[6]).mean())) < \
        abs(float(np.asarray(base[6]).mean()))
    assert abs(float(np.asarray(skin[5]).mean())) < \
        abs(float(np.asarray(base[5]).mean()))
    # COARE 3.5 stress differs from 3.0 but stays the same order
    r = float(np.asarray(c35[0]).mean() / np.asarray(base[0]).mean())
    assert 0.8 < r < 1.2 and r != 1.0
