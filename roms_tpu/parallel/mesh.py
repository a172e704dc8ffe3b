"""Device mesh and sharding helpers — the L2 communication layer.

The reference's only parallelism is 2-D horizontal domain decomposition
with MPI halo exchange (SURVEY.md §2.2-2.3: NtileI x NtileJ tiles,
mp_exchange2d/3d).  Here that becomes a (eta, xi) jax device Mesh with
NamedSharding on the trailing two axes of every field; XLA GSPMD
partitions the stencils and inserts halo collective-permutes where the
reference called mp_exchange (mp_exchange.F:290-333).

`shard_model` places a State/Grid pytree on the mesh; `audit_hlo`
verifies what GSPMD actually inserted: stencil halos must lower to
collective-permute (or per-axis all-to-all shifts), never to
field-sized all-gathers.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              shape: Optional[Tuple[int, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build the (eta, xi) mesh.

    Factors n_devices into the most-square (eta, xi) grid unless an
    explicit shape is given — the analog of the reference's
    NtileI/NtileJ inputs (roms_benchmark1.in:109-110)."""
    devs = list(devices) if devices is not None else jax.devices()
    n = n_devices or len(devs)
    devs = np.asarray(devs[:n])
    if shape is None:
        a = int(np.sqrt(n))
        while n % a:
            a -= 1
        shape = (a, n // a)
    if shape[0] * shape[1] != n:
        from ..core.errors import ExitFlag, RomsError
        raise RomsError(ExitFlag.PARTITION_ERROR,
                        f"mesh shape {shape} != {n} devices")
    return Mesh(devs.reshape(shape), ("eta", "xi"))


def field_spec(ndim: int) -> P:
    """PartitionSpec for a C-grid field: trailing (eta, xi) sharded,
    leading (tracer/level) axes replicated."""
    if ndim >= 2:
        return P(*([None] * (ndim - 2) + ["eta", "xi"]))
    return P()


def shard_array(mesh: Mesh, x):
    x = jax.numpy.asarray(x)
    return jax.device_put(x, NamedSharding(mesh, field_spec(x.ndim)))


def shard_pytree(mesh: Mesh, tree):
    """Place every array leaf of a pytree on the mesh with (eta, xi)
    sharding on the trailing axes (scalars replicated)."""
    return jax.tree_util.tree_map(lambda x: shard_array(mesh, x), tree)


def shard_model(mesh: Mesh, model, state):
    """Shard a Model's grid and a State for mesh execution; returns the
    sharded state (the model's grid is updated in place)."""
    model.grid = shard_pytree(mesh, model.grid)
    return shard_pytree(mesh, state)


# --------------------------------------------------------------------------
# HLO audit: what did GSPMD insert?
# --------------------------------------------------------------------------

_COLLECTIVES = ("collective-permute", "all-gather", "all-reduce",
                "all-to-all", "reduce-scatter")


def audit_hlo(hlo_text: str, field_bytes_threshold: int = 0):
    """Count GSPMD collectives in compiled HLO text.

    Returns dict: per-collective op counts plus `big_all_gathers`, the
    all-gather ops whose output exceeds field_bytes_threshold bytes —
    a field-sized all-gather means GSPMD fell back to replicating a
    sharded array, the failure mode the audit test guards against
    (halo exchange must stay O(halo), mp_exchange.F semantics) — and
    `collective_bytes`, the summed output bytes of every collective
    instruction (static program bytes: an op inside a lax.scan body is
    counted once but executes every iteration; compare programs with
    the same loop structure)."""
    counts = {c: 0 for c in _COLLECTIVES}
    counts["collective_bytes"] = 0
    big_all_gathers = []
    # instruction lines look like:  %x = f32[30,258,2050]{...} all-gather(...)
    inst = re.compile(
        r"=\s*(?:\()?([a-z0-9]+)\[([0-9,]*)\][^=]*?\b"
        r"(collective-permute|all-gather|all-reduce|all-to-all|"
        r"reduce-scatter)\b")
    dtype_bytes = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                   "u32": 4, "pred": 1, "s8": 1, "u8": 1}
    for line in hlo_text.splitlines():
        m = inst.search(line)
        if not m:
            # start/done pairs of async collectives
            for c in _COLLECTIVES:
                if f" {c}-start(" in line or f" {c}(" in line:
                    counts[c] += 1
                    break
            continue
        dt, shape_s, op = m.groups()
        counts[op] += 1
        dims = [int(d) for d in shape_s.split(",") if d]
        nbytes = dtype_bytes.get(dt, 4) * int(np.prod(dims)) \
            if dims else dtype_bytes.get(dt, 4)
        counts["collective_bytes"] += nbytes
        if op == "all-gather" and field_bytes_threshold:
            if nbytes > field_bytes_threshold:
                big_all_gathers.append((line.strip()[:120], nbytes))
    counts["big_all_gathers"] = big_all_gathers
    return counts


def audit_sharded_step(model, state, mesh: Mesh,
                       field_bytes_threshold: Optional[int] = None):
    """Lower the model step over the mesh and audit the optimized HLO.

    field_bytes_threshold defaults to half of one full 2D field — any
    all-gather bigger than that is reassembling a field instead of
    exchanging halos."""
    state = shard_model(mesh, model, state)
    if field_bytes_threshold is None:
        Mj, Li = model.cfg.shape2d
        itemsize = jax.numpy.dtype(model.cfg.dtype).itemsize
        field_bytes_threshold = Mj * Li * itemsize // 2
    with mesh:
        lowered = jax.jit(model.step_impl).lower(state)
        compiled = lowered.compile()
        hlo = compiled.as_text()
    return audit_hlo(hlo, field_bytes_threshold), hlo
