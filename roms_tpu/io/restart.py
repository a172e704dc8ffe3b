"""Checkpoint / perfect restart.

The State pytree carries every time level the stepper consumes (both AB
histories, t_prev, the rufrc slots — the fields the reference's
PERFECT_RESTART writes via wrt_rst.F:43,142-178), so a checkpoint of the
full pytree restarts bit-exactly: step(load(save(s))) == step(s).

Format: a single .npz per record (portable, no daemon); orbax can be
layered for multi-host sharded checkpoints when running on slices.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax

from ..core.state import State
from .checksum import get_hash, verify_hash


def _provenance() -> dict:
    """Run-provenance attributes (wrt_info.F/def_info.F analog):
    creation time, code version, host backend."""
    import subprocess
    try:
        rev = subprocess.run(
            ["git", "-C", __file__.rsplit("/roms_tpu/", 1)[0],
             "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5).stdout.strip()
    except Exception:
        rev = "unknown"
    return {
        "type": "roms_tpu restart file",
        "code_revision": rev,
        "creation_date": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                       time.gmtime()),
        "backend": jax.default_backend(),
        "jax_version": jax.__version__,
    }


def save_checkpoint(path: str, state: State,
                    checksum: str = "crc32") -> None:
    """Write the full State pytree with per-leaf get_hash checksums and
    run-provenance attributes (CHECKSUM + wrt_info semantics)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    hashes = [get_hash(a, checksum) for a in arrs.values()]
    np.savez(path, __num_leaves__=len(leaves),
             __checksums__=np.asarray(hashes, np.int64),
             __checksum_alg__=np.asarray(checksum),
             __provenance__=np.asarray(json.dumps(_provenance())),
             **arrs)


def load_checkpoint(path: str, template: State,
                    verify: bool = True) -> State:
    """Restore into the structure of `template` (same config).

    verify=True checks every leaf against its stored checksum and
    raises RomsError(IO_ERROR) on corruption (nf_fread CHECKSUM
    guard)."""
    data = np.load(path)
    n = int(data["__num_leaves__"])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    if verify and "__checksums__" in data:
        alg = str(data["__checksum_alg__"])
        sums = data["__checksums__"]
        for i, leaf in enumerate(leaves):
            verify_hash(leaf, int(sums[i]), alg, name=f"leaf_{i}")
    _, treedef = jax.tree_util.tree_flatten(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def checkpoint_provenance(path: str) -> dict:
    """Read back the stored provenance attributes."""
    data = np.load(path)
    if "__provenance__" in data:
        return json.loads(str(data["__provenance__"]))
    return {}
