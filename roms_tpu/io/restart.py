"""Checkpoint / perfect restart.

The State pytree carries every time level the stepper consumes (both AB
histories, t_prev, the rufrc slots — the fields the reference's
PERFECT_RESTART writes via wrt_rst.F:43,142-178), so a checkpoint of the
full pytree restarts bit-exactly: step(load(save(s))) == step(s).

Format: a single .npz per record (portable, no daemon); orbax can be
layered for multi-host sharded checkpoints when running on slices.
"""

from __future__ import annotations

import numpy as np
import jax

from ..core.state import State


def save_checkpoint(path: str, state: State) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(path, __num_leaves__=len(leaves), **arrs)


def load_checkpoint(path: str, template: State) -> State:
    """Restore into the structure of `template` (same config)."""
    data = np.load(path)
    n = int(data["__num_leaves__"])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    _, treedef = jax.tree_util.tree_flatten(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)
