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
