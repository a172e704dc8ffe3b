"""Widened-halo sharded fast loop (parallel.fastloop).

Validates the explicit mp_exchange-style path against the unsharded
lax.scan engine on the 8-device virtual CPU mesh:

  - interior bit-equality (to f64 roundoff) for refresh_every=1 and 2
    (step2d_LF_AM3.h:707-714 exchanges twice per substep; the widened
    halo amortizes them);
  - the manual path's compiled HLO carries <= 1/2 the
    collective-permutes of the GSPMD-partitioned fast loop and zero
    all-reduces/all-gathers (mp_exchange.F:290-333 aggregation).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from roms_tpu.core.step2d import make_fast_loop
from roms_tpu.core.weights import power_law_weights
from roms_tpu.functionals import upwelling
from roms_tpu.ops import stencil as st
from roms_tpu.parallel.fastloop import make_sharded_fast_loop
from roms_tpu.parallel.mesh import audit_hlo, make_mesh

FIELD_SCALES = (0.05, 0.1, 0.1, 1e-4, 1e-4, 1e-3, 1e-3,
                1e-4, 1e-4, 1e-4, 1e-4)
OUT_NAMES = ("Zt_avg1", "DU_avg1", "DV_avg1", "DU_avg2", "DV_avg2",
             "rufrc", "rvfrc", "zeta", "ubar", "vbar")


def make_setup(Lm):
    cfg = upwelling.make_config(Lm=Lm, Mm=16, N=4, dt=120.0,
                                ndtfast=10, dtype="float64")
    grid = upwelling.make_grid(cfg)
    Mj, Li = cfg.shape2d
    rng = np.random.default_rng(7)

    def smooth(scale):
        f = rng.standard_normal((Mj, Li))
        for _ in range(4):
            f = 0.5 * f + 0.125 * (np.roll(f, 1, 0) + np.roll(f, -1, 0)
                                   + np.roll(f, 1, 1) + np.roll(f, -1, 1))
        return st.periodic_x(jnp.asarray(f * scale))

    args = [smooth(s) for s in FIELD_SCALES]
    nfast, w1, w2 = power_law_weights(cfg.ndtfast)
    return cfg, grid, args, nfast, w1, w2


@pytest.mark.quick
@pytest.mark.parametrize("nghost,refresh_every", [(7, 1), (14, 2)])
def test_sharded_fastloop_matches_unsharded(nghost, refresh_every):
    cfg, grid, args, nfast, w1, w2 = make_setup(Lm=64)
    ref_loop = make_fast_loop(cfg, nfast, w1, w2)
    ref = ref_loop(grid, *args, 2)
    mesh = make_mesh(8, shape=(1, 8))
    sl = make_sharded_fast_loop(cfg, grid, mesh, nfast, w1, w2,
                                nghost=nghost,
                                refresh_every=refresh_every)
    out = sl(grid, *args, 2)
    # Ghost columns (i=0, Li-1) are roll-wrap garbage in BOTH engines
    # but differ between them (the reference never reads them without a
    # refresh); the physical interior must agree to f64 roundoff.
    for name, a, b in zip(OUT_NAMES, jax.tree_util.tree_leaves(ref),
                          jax.tree_util.tree_leaves(out)):
        diff = jnp.max(jnp.abs((a - b)[..., 1:-1]))
        scale = jnp.maximum(jnp.max(jnp.abs(a[..., 1:-1])), 1e-12)
        assert diff / scale < 1e-12, (name, float(diff), float(scale))


@pytest.mark.quick
def test_manual_halo_fewer_permutes_than_gspmd():
    mesh = make_mesh(8, shape=(1, 8))

    # GSPMD baseline: Lm=62 so Li=64 divides over 8 devices
    cfg, grid, args, nfast, w1, w2 = make_setup(Lm=62)
    ref_loop = make_fast_loop(cfg, nfast, w1, w2)
    sh = NamedSharding(mesh, P("eta", "xi"))
    gargs = [jax.device_put(a, sh) for a in args]

    def gspec(x):
        nd = np.ndim(x)
        return NamedSharding(
            mesh, P(*([None] * (nd - 2) + ["eta", "xi"])) if nd >= 2
            else P())

    ggrid = jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), gspec(x)), grid)
    with mesh:
        hlo_g = jax.jit(lambda *a: ref_loop(ggrid, *a, 2)) \
            .lower(*gargs).compile().as_text()
    cg = audit_hlo(hlo_g)

    # manual path: Lm=64 so the physical columns divide over 8 blocks
    cfg, grid, args, nfast, w1, w2 = make_setup(Lm=64)
    sl = make_sharded_fast_loop(cfg, grid, mesh, nfast, w1, w2,
                                nghost=7, refresh_every=1)
    blocked = [sl.block(a) for a in args]
    with mesh:
        hlo_m = sl.run_sharded.lower(
            sl.gridblk, *blocked, jnp.asarray(2)).compile().as_text()
    cm = audit_hlo(hlo_m)

    assert cg["collective-permute"] > 0
    assert cm["collective-permute"] <= cg["collective-permute"] // 2, \
        (cm["collective-permute"], cg["collective-permute"])
    assert cm["all-reduce"] == 0 and cm["all-gather"] == 0, cm
    assert cm["collective_bytes"] < cg["collective_bytes"], \
        (cm["collective_bytes"], cg["collective_bytes"])


@pytest.mark.quick
@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (2, 1)])
def test_fastloop2d_matches_unsharded(mesh_shape):
    """The generalized (eta, xi) 2-D mesh engine
    (make_sharded_fast_loop2d): interior equality to f64 roundoff vs
    the unsharded lax.scan loop — the eta axis decomposes the WALLED
    direction with masked per-block BCs (parallel.blockctx)."""
    from roms_tpu.parallel.fastloop import make_sharded_fast_loop2d
    cfg, grid, args, nfast, w1, w2 = make_setup(Lm=64)
    ref_loop = make_fast_loop(cfg, nfast, w1, w2)
    ref = ref_loop(grid, *args, 2)
    mesh = make_mesh(int(np.prod(mesh_shape)), shape=mesh_shape)
    sl = make_sharded_fast_loop2d(cfg, grid, mesh, nfast, w1, w2,
                                  nghost=7, refresh_every=1)
    out = sl(grid, *args, 2)
    _assert_close_2d(ref, out)


def _assert_close_2d(ref, out):
    for name, a, b in zip(OUT_NAMES, jax.tree_util.tree_leaves(ref),
                          jax.tree_util.tree_leaves(out)):
        d = jnp.abs((a - b)[..., 1:-1, 1:-1])
        if name == "rvfrc":
            # the V-wall rows (global 1 / Mm+1) are never computed by
            # the reference (its JstrV loop starts at row 2) and the
            # whole-array engine fills them with roll-wrap garbage
            # that the blocked torus cannot reproduce; vbar there is
            # zeroed by bc_v every substep, so the rows are inert
            d = d[..., 1:-1, :]
        diff = jnp.max(d)
        scale = jnp.maximum(jnp.max(jnp.abs(a[..., 1:-1, 1:-1])),
                            1e-12)
        assert diff / scale < 1e-12, (name, float(diff), float(scale))


@pytest.mark.quick
def test_fastloop2d_widened_halo_refresh2():
    from roms_tpu.parallel.fastloop import make_sharded_fast_loop2d
    cfg, grid, args, nfast, w1, w2 = make_setup(Lm=64)
    ref = make_fast_loop(cfg, nfast, w1, w2)(grid, *args, 2)
    mesh = make_mesh(8, shape=(2, 4))
    sl = make_sharded_fast_loop2d(cfg, grid, mesh, nfast, w1, w2,
                                  nghost=14, refresh_every=2)
    out = sl(grid, *args, 2)
    _assert_close_2d(ref, out)


@pytest.mark.quick
def test_substep_contamination_reach_bound():
    """Pins the widened-halo sizing claim: one LF-AM3 substep's
    influence radius (cells changed by a point perturbation) must not
    exceed the per-substep reach budgeted by the sharded engines
    (nghost=7 per refresh for refresh_every=1, 14 for 2).  A stencil
    change that widens the reach fails HERE instead of silently
    corrupting shard interiors."""
    from roms_tpu.core.step2d import make_substep_kernels
    cfg, grid, args, nfast, w1, w2 = make_setup(Lm=64)
    import jax.numpy as jnp
    w1j = jnp.asarray(w1, jnp.float64)
    w2j = jnp.asarray(w2, jnp.float64)
    predictor, corrector, aux_pass, init_carry = make_substep_kernels(
        cfg, nfast, w1j, w2j, True)
    (zeta0, ubar0, vbar0, rufrc, rvfrc, rhoS, rhoA,
     ru0p, rv0p, ru0p2, rv0p2) = args

    def one_substep(z0):
        c = init_carry(z0, ubar0, vbar0, rufrc, rvfrc, ru0p, rv0p)
        out = predictor(grid, 2, c, rhoS, rhoA, 2, ru0p2, rv0p2, None)
        c = c._replace(avg=out[8])
        c2 = corrector(grid, 2, c, *out[:8], rhoS, rhoA, None)
        return c2.zeta, c2.ubar, c2.vbar

    base = one_substep(zeta0)
    jc, ic = 9, 33
    pert = zeta0.at[jc, ic].add(1e-3)
    out = one_substep(pert)
    reach = 0
    for a, b in zip(base, out):
        d = np.abs(np.asarray(a - b)) > 1e-14
        jj, ii = np.nonzero(d[..., 1:-1])
        if len(ii):
            # xi distance on the periodic interior
            dx = np.abs((ii + 1) - ic)
            dx = np.minimum(dx, 64 - dx)
            reach = max(reach, int(dx.max()),
                        int(np.abs(jj - jc).max()))
    assert 0 < reach <= 7, reach
