"""Sharded (parallel) checkpointing via orbax/tensorstore.

The reference's PARALLEL_IO path gathers to rank 0 or uses
NetCDF4/HDF5 collective writes (ROMS/Utility/nf_fwrite3d.F,
distribute.F mp_gather).  On a TPU pod the equivalent is
shard-parallel array IO: every host writes only its own shards of the
GSPMD-sharded State pytree, and restore re-shards to the live mesh.
orbax + tensorstore provide exactly this; the wrapper below pins the
State NamedTuple structure and the target shardings.

For bitwise single-host round-trips of unsharded runs, io/restart.py
remains the lightweight path; this module is the multi-host one.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..core.state import State


def save_checkpoint(path: str, state: State, step: int = 0):
    """Write a sharded checkpoint (each process writes its shards)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, f"step_{step}"),
               {"state": _to_tree(state)})
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template: State, step: int = 0):
    """Restore onto the shardings/dtypes of `template` (a State of the
    live run, typically from initial_state + device_put)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    tree = {"state": _to_tree(template)}
    restored = ckptr.restore(os.path.join(path, f"step_{step}"), tree)
    return _from_tree(restored["state"], template)


def _to_tree(state: State):
    return {k: v for k, v in state._asdict().items() if v is not None}


def _from_tree(tree, template: State):
    kw = dict(template._asdict())
    kw.update(tree)
    return State(**kw)
