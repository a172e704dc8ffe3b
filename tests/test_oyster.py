"""Oyster-larvae biology floats (oyster_floats.h behavior model)."""

import numpy as np
import pytest

import jax.numpy as jnp

from roms_tpu.core import oyster
from roms_tpu.core.floats import Floats, step_floats
from roms_tpu.core.oyster import (OysterConfig, default_tables,
                                  initial_oyster, load_behavior_deck,
                                  oyster_step, table_interp)
from roms_tpu.functionals import upwelling


def make_env(nf=6):
    cfg = upwelling.make_config(Lm=16, Mm=16, N=8, dtype="float64")
    grid = upwelling.make_grid(cfg)
    s = upwelling.make_initial(cfg, grid)
    Mj, Li = cfg.shape2d
    # warm salty surface over cooler fresher deep: favorable growth
    k = jnp.linspace(-1.0, 0.0, cfg.N)[:, None, None]
    T = 18.0 + 8.0 * (1.0 + k) + jnp.zeros((cfg.N, Mj, Li))
    S = 20.0 + 4.0 * (1.0 + k) + jnp.zeros((cfg.N, Mj, Li))
    t = jnp.stack([T, S])
    flt = Floats(x=jnp.linspace(3.0, 12.0, nf),
                 y=jnp.full((nf,), 8.0),
                 s=jnp.full((nf,), -0.5),
                 bounded=jnp.ones((nf,), bool))
    return cfg, grid, s, t, flt


@pytest.mark.quick
def test_growth_and_behavior_signs():
    cfg, grid, state, t, flt = make_env()
    oc = OysterConfig()
    tb = default_tables()
    ost = initial_oyster(oc, 6)
    sc_r = np.asarray(grid.sc_r)
    ost1, w = oyster_step(cfg, oc, tb, ost, flt, t, sc_r, first=True)
    # favorable T/S: larvae grow
    assert (np.asarray(ost1.size) > np.asarray(ost.size)).all()
    # the exponential sinking term dominates more with size
    # (oyster_floats.h:396-407): larger larvae have more negative w
    big = ost._replace(size=jnp.full((6,), 320.0))
    _, wbig = oyster_step(cfg, oc, tb, big, flt, t, sc_r, first=True)
    assert (np.asarray(wbig) < np.asarray(w)).all()
    assert (np.asarray(wbig) < 0.0).all()
    # a fully-swimming larva is less negative than a resting one
    act = ost._replace(swim_frac=jnp.full((6,), oc.swim_Tmax))
    rest = ost._replace(swim_frac=jnp.full((6,), oc.swim_Tmin))
    _, wact = oyster_step(cfg, oc, tb, act, flt, t, sc_r, first=True)
    _, wrest = oyster_step(cfg, oc, tb, rest, flt, t, sc_r, first=True)
    assert (np.asarray(wact) > np.asarray(wrest)).all()


@pytest.mark.quick
def test_cold_water_stops_growth():
    cfg, grid, state, t, flt = make_env()
    t = t.at[0].set(2.0)                 # below Gfactor_T0 = 7 C
    oc = OysterConfig()
    ost = initial_oyster(oc, 6)
    ost1, _ = oyster_step(cfg, oc, default_tables(), ost, flt, t,
                          np.asarray(grid.sc_r), first=True)
    np.testing.assert_allclose(np.asarray(ost1.size),
                               np.asarray(ost.size))


@pytest.mark.quick
def test_settlement_freezes():
    cfg, grid, state, t, flt = make_env()
    oc = OysterConfig()
    ost = initial_oyster(oc, 6)._replace(size=jnp.full((6,), 331.0))
    ost1, w = oyster_step(cfg, oc, default_tables(), ost, flt, t,
                          np.asarray(grid.sc_r), first=True)
    assert bool(np.asarray(ost1.settled).all())
    np.testing.assert_allclose(np.asarray(ost1.size), 331.0)
    np.testing.assert_allclose(np.asarray(w), 0.0)


@pytest.mark.quick
def test_behavior_moves_floats_vertically():
    cfg, grid, state, t, flt = make_env()
    from roms_tpu.grid.depth import set_depth
    z_r, z_w, Hz = set_depth(grid, state.zeta)
    zeros3 = jnp.zeros((cfg.N, *cfg.shape2d))
    W = jnp.zeros((cfg.N + 1, *cfg.shape2d))
    w_up = jnp.full((6,), 1.0e-3)        # 1 mm/s upward
    f1 = step_floats(cfg, grid, flt, zeros3, zeros3, W, Hz,
                     np.asarray(grid.sc_r), w_extra=w_up)
    assert (np.asarray(f1.s) > np.asarray(flt.s)).all()


@pytest.mark.quick
def test_behavior_deck_roundtrip(tmp_path):
    deck = tmp_path / "behavior.in"
    deck.write_text("""
! synthetic behavior deck
  Larvae_size0 == 55.0d0
   settle_size == 300.0d0
     swim_Tmin == 0.6d0
     swim_Tmax == 0.8d0
      Grate_F0 == 1.0d0
      Grate_DF == 1.0d0
      Grate_L0 == 50.0d0
      Grate_DL == 100.0d0
    Gfactor_S0 == 5.0d0
    Gfactor_DS == 10.0d0
    Gfactor_T0 == 8.0d0
    Gfactor_DT == 10.0d0
       swim_L0 == 50.0d0
       swim_DL == 100.0d0
       swim_T0 == 8.0d0
       swim_DT == 10.0d0

   Grate_table =  growth look table (3,2)

 1.0 2.0 3.0
 4.0 5.0 6.0

 Gfactor_table =  factor look table (2,2)

 0.1 0.2
 0.3 0.4

    swim_table =  swim look table (2,2)

 0.5 0.6
 0.7 0.8
""")
    oc, tb = load_behavior_deck(str(deck))
    assert oc.Larvae_size0 == 55.0 and oc.settle_size == 300.0
    assert tb.grate.data.shape == (3, 2)
    # table(1:Im,1:Jm): first row is J-level 1 over the I axis
    assert float(tb.grate.data[2, 0]) == 3.0
    assert float(tb.grate.data[0, 1]) == 4.0
    # interpolation midpoint
    v = float(table_interp(tb.gfactor, 10.0, 13.0))
    assert abs(v - 0.25) < 1e-12
