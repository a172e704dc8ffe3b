"""Open-boundary condition tests on the KELVIN case (ROMS/Include/
kelvin.h): Chapman-implicit zeta + Flather 2D momentum at the west,
oblique radiation at the east."""

import numpy as np
import pytest

from roms_tpu.core.stepping import Model
from roms_tpu.functionals import kelvin


@pytest.fixture(scope="module")
def run_one_period():
    cfg = kelvin.make_config()
    grid = kelvin.make_grid(cfg)
    state = kelvin.make_initial(cfg, grid)
    model = Model(cfg, grid, kelvin.make_forcing_fn(cfg, grid),
                  obc_fn=kelvin.make_obc_fn(cfg, grid))
    s = model.run(state, 50)     # ~ one M2 period at dt=900s
    return cfg, grid, s


class TestKelvinOBC:
    def test_wave_enters_and_stays_bounded(self, run_one_period):
        cfg, grid, s = run_one_period
        z = np.asarray(s.zeta)
        assert np.isfinite(z).all()
        # forced amplitude is 1 m; interior response must be substantial
        # but not amplified (radiation must not reflect/blow up)
        assert 0.1 < np.abs(z[1:-1, 1:-1]).max() < 1.5
        assert np.isfinite(np.asarray(s.u)).all()
        assert np.abs(np.asarray(s.u)).max() < 1.0

    def test_kelvin_offshore_decay(self, run_one_period):
        """Amplitude decays away from the southern coast like
        exp(-f y / sqrt(gh))."""
        cfg, grid, s = run_one_period
        z = np.asarray(s.zeta)
        inshore = np.abs(z[1:6, 2:20]).max()
        offshore = np.abs(z[-6:-1, 2:20]).max()
        assert offshore < 0.5 * inshore

    def test_no_reflection_growth(self, run_one_period):
        """Integrate one more period: energy must not grow unboundedly
        (radiation boundary leaks the wave out)."""
        cfg, grid, s = run_one_period
        model = Model(cfg, grid, kelvin.make_forcing_fn(cfg, grid),
                      obc_fn=kelvin.make_obc_fn(cfg, grid))
        s2 = model.run(s, 50)
        z2 = np.asarray(s2.zeta)
        assert np.isfinite(z2).all()
        assert np.abs(z2[1:-1, 1:-1]).max() < 2.0


def test_volume_conservation_enforced():
    """obc_volcons: with VolCons on both open edges the basin volume is
    invariant despite boundary forcing."""
    import dataclasses
    cfg = kelvin.make_config(Lm=30, Mm=16, N=6)
    cfg = cfg.replace(bc=dataclasses.replace(cfg.bc,
                                             volcons=("west", "east")))
    grid = kelvin.make_grid(cfg)
    st = kelvin.make_initial(cfg, grid)
    m = Model(cfg, grid, kelvin.make_forcing_fn(cfg, grid),
              obc_fn=kelvin.make_obc_fn(cfg, grid))
    s = m.run(st, 50)
    omn = 1.0 / np.asarray(grid.pm * grid.pn)
    vol = (np.asarray(s.zeta)[1:-1, 1:-1] * omn[1:-1, 1:-1]).sum()
    assert abs(vol) < 1.0e-3          # m3, vs ~1e9 without VolCons
    assert np.isfinite(np.asarray(s.zeta)).all()


def test_shchepetkin_ubar_obc():
    """Shchepetkin 2D-momentum OBC (u2dbc_im.F:294-365): admits the
    forced Kelvin wave like Flather, bounded response, no blow-up."""
    import dataclasses
    from roms_tpu import config as C

    def run(kind):
        cfg = kelvin.make_config(Lm=40, Mm=16, N=5)
        bc = dataclasses.replace(
            cfg.bc, ubar=C.LBC(west=kind, east=C.GRADIENT,
                               south=C.CLOSED, north=C.CLOSED))
        cfg = cfg.replace(bc=bc)
        grid = kelvin.make_grid(cfg)
        m = Model(cfg, grid, kelvin.make_forcing_fn(cfg, grid),
                  obc_fn=kelvin.make_obc_fn(cfg, grid))
        return m.run(kelvin.make_initial(cfg, grid), 50)

    s_sh = run(C.SHCHEPETKIN)
    s_fl = run(C.FLATHER)
    z_sh = np.abs(np.asarray(s_sh.zeta)[1:-1, 1:-1]).max()
    z_fl = np.abs(np.asarray(s_fl.zeta)[1:-1, 1:-1]).max()
    assert np.isfinite(np.asarray(s_sh.zeta)).all()
    assert 0.3 < z_sh < 1.5              # wave entered, no blow-up
    assert abs(z_sh - z_fl) < 0.5 * max(z_sh, z_fl)


def test_reduced_physics_obc():
    """Reduced-physics open boundary (u2dbc reduced branch): the
    boundary-normal barotropic momentum follows the simplified
    -g dzeta/dx + f vbar balance, letting a surface slope drive flow
    through the edge instead of the closed wall reflecting it."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from roms_tpu import config as C
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import upwelling
    cfg = upwelling.make_config(Lm=20, Mm=12, N=4, dtype="float64")
    bc = C.BoundaryConfig(
        zeta=C.LBC(west=C.CHAPMAN_IMPLICIT),
        ubar=C.LBC(west=C.REDUCED),
        vbar=C.LBC(), u=C.LBC(), v=C.LBC(), t=C.LBC(),
        tke=C.LBC.same(C.GRADIENT))
    cfg = cfg.replace(bc=dataclasses.replace(bc))
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    # --- formula-level check of the reduced balance -------------------
    from roms_tpu.core import obc as obc_mod
    Mj, Li = cfg.shape2d
    z_old = jnp.asarray(0.05 * np.exp(-np.arange(Li) / 3.0)[None, :]
                        * np.ones((Mj, 1)))
    ub_old = jnp.zeros((Mj, Li))
    vb_old = jnp.zeros((Mj, Li))
    dt2d = 10.0
    ub2, vb2 = obc_mod.u2dbc_reduced(
        cfg, grid, ub_old, vb_old, ub_old, vb_old, z_old, dt2d,
        obc={"zeta": {"west": z_old[:, 0] * 0.0}})
    pm01 = 0.5 * (np.asarray(grid.pm)[:, 0] + np.asarray(grid.pm)[:, 1])
    expect = dt2d * (-cfg.g * np.asarray(z_old)[:, 1] * pm01)
    np.testing.assert_allclose(np.asarray(ub2)[2:-2, 1],
                               expect[2:-2], rtol=1e-12)
    # --- stability of the full model with the reduced edge ------------
    s0 = s0._replace(zeta=z_old)
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              vmix_fn=upwelling.make_vmix_fn(cfg))
    s = m.run(s0, 10)
    assert np.isfinite(np.asarray(s.ubar)).all()
    assert np.abs(np.asarray(s.ubar)).max() < 1.0
