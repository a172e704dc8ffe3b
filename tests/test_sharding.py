"""Shard-count invariance: the jitted step must produce identical physics
on 1 device and on an 8-device (eta, xi) mesh.

This is the TPU analog of the reference's tile-count invariance guarantee
(SURVEY.md section 4.4: same physics for any NtileI x NtileJ): GSPMD
partitions the whole-array stencils and inserts halo collective-permutes
in place of mp_exchange2d/3d.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


@pytest.fixture(scope="module")
def setup():
    cfg = upwelling.make_config(Lm=30, Mm=30, N=8, dtype="float64")
    grid = upwelling.make_grid(cfg)
    state = upwelling.make_initial(cfg, grid)
    model = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  upwelling.make_vmix_fn(cfg))
    return cfg, grid, state, model


def _shard_tree(tree, mesh):
    def shard(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 2:
            spec = P(*([None] * (x.ndim - 2) + ["eta", "xi"]))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(shard, tree)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_shard_invariance(setup):
    cfg, grid, state, model = setup
    ref = state
    for _ in range(3):
        ref = model.step(ref)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("eta", "xi"))
    s = _shard_tree(state, mesh)
    g = _shard_tree(grid, mesh)
    stepper = jax.jit(model.step_impl)
    for _ in range(3):
        s = stepper(s, g)
    jax.block_until_ready(s)

    for name in ("zeta", "ubar", "vbar", "u", "v", "t"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(s, name))
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-12, err_msg=name)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharding_stays_distributed(setup):
    """The stepped state must remain sharded (no accidental gather)."""
    cfg, grid, state, model = setup
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("eta", "xi"))
    s = _shard_tree(state, mesh)
    g = _shard_tree(grid, mesh)
    out = jax.jit(model.step_impl)(s, g)
    assert not out.u.sharding.is_fully_replicated
