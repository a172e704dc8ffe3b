"""Pallas TPU tridiagonal kernel vs the reference scan solver
(interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from roms_tpu.ops.pallas_tridiag import tridiag_solve_pallas
from roms_tpu.ops.tridiag import tridiag_solve


def test_pallas_matches_scan():
    rng = np.random.default_rng(3)
    N, Mj, Li = 12, 10, 20
    a = jnp.asarray(rng.uniform(0.1, 0.5, (N, Mj, Li)))
    b = jnp.asarray(rng.uniform(2.0, 3.0, (N, Mj, Li)))
    c = jnp.asarray(rng.uniform(0.1, 0.5, (N, Mj, Li)))
    d = jnp.asarray(rng.normal(size=(N, Mj, Li)))
    x_ref = np.asarray(tridiag_solve(a, b, c, d))
    x_pl = np.asarray(tridiag_solve_pallas(a, b, c, d, tj=8, ti=16,
                                           interpret=True))
    np.testing.assert_allclose(x_pl, x_ref, atol=1e-12)


def test_pallas_padding():
    """Non-tile-multiple horizontal shapes are padded correctly."""
    rng = np.random.default_rng(4)
    N, Mj, Li = 7, 13, 29
    b = jnp.asarray(rng.uniform(2.0, 3.0, (N, Mj, Li)))
    a = jnp.asarray(rng.uniform(0.1, 0.3, (N, Mj, Li)))
    c = jnp.asarray(rng.uniform(0.1, 0.3, (N, Mj, Li)))
    d = jnp.asarray(rng.normal(size=(N, Mj, Li)))
    x_ref = np.asarray(tridiag_solve(a, b, c, d))
    x_pl = np.asarray(tridiag_solve_pallas(a, b, c, d, tj=8, ti=16,
                                           interpret=True))
    np.testing.assert_allclose(x_pl, x_ref, atol=1e-12)
