"""HLO audit of the sharded step (VERDICT round-1 item 4).

Asserts what GSPMD actually inserts on an 8-device (eta, xi) mesh:
halo exchange lowers to collective-permute (the mp_exchange analog,
mp_exchange.F:290-333) and NO field-sized all-gather appears — i.e.
the decomposition stays O(halo) in communication, never reassembling
a full field on every device.
"""

import numpy as np
import pytest

import jax

from roms_tpu.core.stepping import Model
from roms_tpu.functionals import benchmark
from roms_tpu.parallel import audit_sharded_step, make_mesh


@pytest.fixture(scope="module")
def audit():
    cfg = benchmark.make_config(Lm=126, Mm=62, N=8, dtype="float64")
    grid = benchmark.make_grid(cfg)
    state = benchmark.make_initial(cfg, grid)
    model = Model(cfg, grid, benchmark.make_forcing_fn(cfg, grid))
    mesh = make_mesh(8, shape=(2, 4))
    counts, hlo = audit_sharded_step(model, state, mesh)
    return counts, hlo


def test_mesh_factoring():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("eta", "xi")


def test_halos_are_collective_permutes(audit):
    counts, _ = audit
    assert counts["collective-permute"] > 0, counts


def test_no_field_sized_all_gathers(audit):
    counts, _ = audit
    assert counts["big_all_gathers"] == [], \
        f"GSPMD replicated fields: {counts['big_all_gathers'][:3]}"


def test_partition_error():
    from roms_tpu.core.errors import RomsError
    with pytest.raises(RomsError) as ei:
        make_mesh(8, shape=(3, 2))
    assert ei.value.exit_flag == 6


def test_explicit_halo_exchange():
    """shard_map + ppermute halo refresh (the mp_exchange.F analog):
    after exchanging, every shard's ring equals the neighbor's interior
    edge — verified against the numpy ground truth on an 8-device
    mesh, corners included (two-phase W/E-then-N/S)."""
    import jax.numpy as jnp
    from roms_tpu.parallel.halo import (blocks_with_halo,
                                        make_halo_exchange)
    mesh = make_mesh(8, shape=(2, 4))
    rng = np.random.default_rng(1)
    Mj, Li = 16, 32                     # divisible by (2, 4)
    g = rng.normal(size=(Mj, Li))
    stale = blocks_with_halo(g * 0.0, mesh)      # zeroed rings
    # fill interiors with the true data, rings left stale (zero)
    fresh = blocks_with_halo(g, mesh)
    neta, nxi = 2, 4
    bj, bi = Mj // neta + 2, Li // nxi + 2
    blocks = fresh.copy()
    for jb in range(neta):
        for ib in range(nxi):
            blk = blocks[jb * bj:(jb + 1) * bj, ib * bi:(ib + 1) * bi]
            blk[0, :] = 0.0
            blk[-1, :] = 0.0
            blk[:, 0] = 0.0
            blk[:, -1] = 0.0
    exchange = make_halo_exchange(mesh)
    out = np.asarray(exchange(jnp.asarray(blocks)))
    # after the exchange the blocks match the ground-truth haloed
    # layout (rings = neighbor interiors, wrap included)
    np.testing.assert_allclose(out, fresh, atol=1e-14)
