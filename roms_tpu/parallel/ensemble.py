"""Disjoint sub-mesh forking for concurrent/ensemble runs.

The reference forks MPI communicators to run concurrent ensembles or
coupled components on disjoint rank groups
(ROMS_COMM_fork/ROMS_COMM_join, mod_parallel.F:410-588).  The jax
analog partitions the device list into disjoint sub-meshes, one per
member/component; each member's jitted step runs under its own Mesh so
XLA schedules the members concurrently on their own chips.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax

from .mesh import Mesh, make_mesh, shard_model


def fork_meshes(n_members: int, devices: Optional[Sequence] = None,
                member_shape=None) -> List[Mesh]:
    """Split the device list into n_members disjoint (eta, xi) meshes
    (ROMS_COMM_fork analog).  Raises PARTITION_ERROR when the devices
    do not divide evenly."""
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if n % n_members:
        from ..core.errors import ExitFlag, RomsError
        raise RomsError(ExitFlag.PARTITION_ERROR,
                        f"{n} devices do not split into "
                        f"{n_members} members")
    per = n // n_members
    return [make_mesh(per, shape=member_shape,
                      devices=devs[m * per:(m + 1) * per])
            for m in range(n_members)]


class EnsembleRunner:
    """Run N model members concurrently on forked sub-meshes.

    members: list of (model, state).  Each member's arrays are placed
    on its own sub-mesh; step() dispatches every member's jitted step —
    the dispatches are asynchronous, so disjoint-device members execute
    concurrently (the fork semantics of split 4D-Var / ensemble
    drivers)."""

    def __init__(self, members, devices: Optional[Sequence] = None,
                 member_shape=None):
        self.meshes = fork_meshes(len(members), devices, member_shape)
        self.models = []
        self.states = []
        for (model, state), mesh in zip(members, self.meshes):
            self.models.append(model)
            self.states.append(shard_model(mesh, model, state))

    def step(self, nsteps: int = 1):
        """Advance every member nsteps (asynchronously dispatched)."""
        for _ in range(nsteps):
            new_states = []
            for model, state, mesh in zip(self.models, self.states,
                                          self.meshes):
                with mesh:
                    new_states.append(model.step(state))
            self.states = new_states
        jax.block_until_ready(self.states)
        return self.states

    def join(self):
        """Gather all member states to host (ROMS_COMM_join analog)."""
        return [jax.device_get(s) for s in self.states]
