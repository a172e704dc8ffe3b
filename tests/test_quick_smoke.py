"""Quick smoke tier: `pytest -m quick` (< 5 min cold).

One cheap probe per subsystem so regressions surface without the
~45-minute full suite: a tiny full-physics model step (the single
compile the module amortizes), the deck parser, the EOS check values,
filter weights, halo exchange on the virtual mesh, autodiff through a
step, file ingest, and output streams.  Everything shares one tiny
UPWELLING configuration (8x6x4) to keep the compile count at ~2.
"""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roms_tpu.core import stepping
from roms_tpu.functionals import upwelling

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def tiny():
    cfg = upwelling.make_config(Lm=8, Mm=6, N=4, dt=60.0, ndtfast=6,
                                dtype="float64")
    grid = upwelling.make_grid(cfg)
    state = upwelling.make_initial(cfg, grid)
    model = stepping.Model(cfg, grid,
                           forcing_fn=upwelling.make_forcing_fn(cfg, grid),
                           vmix_fn=upwelling.make_vmix_fn(cfg))
    return cfg, grid, state, model


def test_step_finite_and_symmetric(tiny):
    cfg, grid, state, model = tiny
    s = state
    for _ in range(2):
        s = model.step(s)
    z = np.asarray(s.zeta)
    assert np.isfinite(z).all()
    # EW-periodic x-uniform setup stays x-uniform
    assert np.abs(z - z.mean(axis=1, keepdims=True)).max() < 1e-12


def test_restart_roundtrip_bitwise(tiny):
    from roms_tpu.io.restart import load_checkpoint, save_checkpoint
    cfg, grid, state, model = tiny
    s1 = model.step(state)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_checkpoint(path, s1)
        s1b = load_checkpoint(path, template=s1)
    s2a = model.step(s1)
    s2b = model.step(s1b)
    np.testing.assert_array_equal(np.asarray(s2a.zeta),
                                  np.asarray(s2b.zeta))
    np.testing.assert_array_equal(np.asarray(s2a.t), np.asarray(s2b.t))


def test_rho_eos_check_values(tiny):
    """Jackett & McDougall 1995 check value (rho_eos.F:21-37):
    rho(T=3 C, S=35.5 PSU, Z=-5000 m) = 1050.3639165364 (kg/m3)."""
    from roms_tpu.core.rho_eos import rho_eos_jm95
    cfg = tiny[0]
    t = jnp.stack([jnp.full((1, 1, 1), 3.0), jnp.full((1, 1, 1), 35.5)])
    z = jnp.full((1, 1, 1), -5000.0)
    rho = float(rho_eos_jm95(cfg, t, z)[0, 0, 0]) + 1000.0
    assert rho == pytest.approx(1050.3639165364, abs=5e-4)


def test_filter_weights_normalized():
    from roms_tpu.core.weights import power_law_weights
    nfast, w1, w2 = power_law_weights(20)
    assert nfast > 20
    np.testing.assert_allclose(np.sum(np.asarray(w1)), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.sum(np.asarray(w2)), 1.0, atol=1e-12)


def test_deck_parser():
    from roms_tpu.io.roms_in import parse_roms_in, to_config
    params = parse_roms_in("""
Lm == 8
Mm == 6
N == 4
DT == 60.0d0
NDTFAST == 6
THETA_S == 3.0d0
LBC(isFsur) == Per Clo Per Clo
""")
    cfg = to_config(params)
    assert (cfg.Lm, cfg.Mm, cfg.N) == (8, 6, 4)
    assert cfg.dt == 60.0
    assert cfg.bc.ew_periodic


def test_halo_exchange_virtual_mesh():
    from roms_tpu.parallel import make_mesh
    from roms_tpu.parallel.halo import blocks_with_halo, \
        make_halo_exchange
    mesh = make_mesh(4, shape=(2, 2))
    rng = np.random.default_rng(3)
    g = rng.normal(size=(8, 8))
    fresh = blocks_with_halo(g, mesh)          # ground truth w/ rings
    stale = fresh.copy()
    bj, bi = 8 // 2 + 2, 8 // 2 + 2
    for jb in range(2):
        for ib in range(2):
            blk = stale[jb * bj:(jb + 1) * bj, ib * bi:(ib + 1) * bi]
            blk[0, :] = blk[-1, :] = 0.0
            blk[:, 0] = blk[:, -1] = 0.0
    out = np.asarray(make_halo_exchange(mesh)(jnp.asarray(stale)))
    np.testing.assert_allclose(out, fresh, atol=1e-14)


def test_autodiff_through_step(tiny):
    cfg, grid, state, model = tiny

    def loss(zeta0):
        s = state._replace(zeta=zeta0)
        out = model.step_impl(s, grid)
        return jnp.sum(out.zeta ** 2)

    g = jax.grad(loss)(state.zeta)
    assert np.isfinite(np.asarray(g)).all()


def test_grid_file_roundtrip(tiny):
    from roms_tpu.io.grid_nc import load_grid_netcdf, write_grid_netcdf
    cfg, grid, _, _ = tiny
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g.nc")
        write_grid_netcdf(p, cfg, grid)
        g1 = load_grid_netcdf(p, cfg)
    np.testing.assert_allclose(np.asarray(g1.h), np.asarray(grid.h),
                               atol=1e-14)


def test_history_output(tiny):
    from scipy.io import netcdf_file
    from roms_tpu.io.netcdf import HistoryWriter
    cfg, grid, state, model = tiny
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "his.nc")
        w = HistoryWriter(p, cfg, grid, fields=("zeta", "temp"))
        w.write(state)
        w.close()
        f = netcdf_file(p, "r", mmap=False)
        assert f.variables["zeta"].shape[1:] == cfg.shape2d
        f.close()
