"""L2 communication layer: device mesh, shardings, HLO collective audit.

Replaces the reference's MPI backend (mp_exchange.F, distribute.F) with
a (eta, xi) jax device mesh + GSPMD-inserted collectives; see mesh.py.
"""

from .mesh import (audit_hlo, audit_sharded_step, field_spec, make_mesh,
                   shard_array, shard_model, shard_pytree)

__all__ = ["audit_hlo", "audit_sharded_step", "field_spec", "make_mesh",
           "shard_array", "shard_model", "shard_pytree"]
