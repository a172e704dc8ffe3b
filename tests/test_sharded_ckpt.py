"""Sharded checkpoint round-trip with orbax on a virtual device mesh
(the PARALLEL_IO equivalent: shard-parallel array writes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling
from roms_tpu.io.sharded_ckpt import restore_checkpoint, save_checkpoint


def test_sharded_roundtrip(tmp_path):
    cfg = upwelling.make_config(Lm=22, Mm=22, N=6, dtype="float64")
    grid = upwelling.make_grid(cfg)
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              vmix_fn=upwelling.make_vmix_fn(cfg))
    s = m.run(upwelling.make_initial(cfg, grid), 3)

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("eta", "xi"))
    sh2 = NamedSharding(mesh, P("eta", "xi"))
    sh3 = NamedSharding(mesh, P(None, "eta", "xi"))

    def put(x):
        if x is None or np.ndim(x) == 0:
            return x
        if np.ndim(x) == 2:
            return jax.device_put(x, sh2)
        spec = P(*([None] * (np.ndim(x) - 2) + ["eta", "xi"]))
        return jax.device_put(x, NamedSharding(mesh, spec))

    s_sh = jax.tree_util.tree_map(put, s)
    save_checkpoint(str(tmp_path / "ckpt"), s_sh, step=3)

    template = jax.tree_util.tree_map(put, m.run(
        upwelling.make_initial(cfg, grid), 0))
    restored = restore_checkpoint(str(tmp_path / "ckpt"), template,
                                  step=3)

    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(s_sh)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored arrays carry the requested sharding
    assert restored.zeta.sharding.is_equivalent_to(sh2, 2)
