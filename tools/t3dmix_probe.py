#!/usr/bin/env python
"""Decompose t3dmix2_geo cost on TPU at BENCHMARK2 size.

Times the isolated jit of the rotated harmonic operator, its XLA
bytes-accessed, and the same for sub-pieces (horizontal fluxes only,
vertical cross-flux only) to find where the traffic blowup lives.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, reps=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def cost(fn, args):
    import jax
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return ca.get("bytes accessed", float("nan"))
    except Exception:
        return float("nan")


def main():
    import jax
    import jax.numpy as jnp
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from roms_tpu.core import hmix
    from roms_tpu.functionals import benchmark
    from roms_tpu.grid.depth import set_depth

    cfg = benchmark.make_config(Lm=1024, Mm=128, full_physics=True)
    grid = benchmark.make_grid(cfg)
    state = benchmark.make_initial(cfg, grid)
    z_r, z_w, Hz = set_depth(grid, state.zeta)
    t = state.t
    t_part = t * Hz

    f = jax.jit(lambda tt, tp, hz, zr: hmix.t3dmix2_geo(
        cfg, grid, tt, tp, hz, zr))
    args = (t, t_part, Hz, z_r)
    ms = timeit(f, args) * 1e3
    gb = cost(lambda tt, tp, hz, zr: hmix.t3dmix2_geo(
        cfg, grid, tt, tp, hz, zr), args) / 1e9
    fld = t[0].nbytes / 1e9
    print(f"t3dmix2_geo: {ms:.2f} ms, {gb:.2f} GB accessed "
          f"({gb / fld:.0f} field-passes), roofline {gb / 0.819:.2f} ms")

    # one tracer's rotated divergence alone
    pm_u = 0.5 * (grid.pm + jnp.roll(grid.pm, 1, -1)) * grid.umask
    pn_v = 0.5 * (grid.pn + jnp.roll(grid.pn, 1, -2)) * grid.vmask
    dZdx = pm_u * (z_r - jnp.roll(z_r, 1, -1))
    dZde = pn_v * (z_r - jnp.roll(z_r, 1, -2))

    def one(q, hz, zr, zx, ze):
        return hmix._rot_div_geo(cfg, grid, q, grid.diff2[0], hz, zr,
                                 zx, ze)

    args1 = (t[0], Hz, z_r, dZdx, dZde)
    ms1 = timeit(jax.jit(one), args1) * 1e3
    gb1 = cost(one, args1) / 1e9
    print(f"_rot_div_geo x1: {ms1:.2f} ms, {gb1:.2f} GB "
          f"({gb1 / fld:.0f} passes)")

    # Pallas fused path: parity + timing
    import numpy as np
    from roms_tpu.ops import pallas_hmix

    def onep(q, hz, zr):
        return pallas_hmix.rot_div_geo_pallas(cfg, grid, q,
                                              grid.diff2[0], hz, zr)

    ref = np.asarray(jax.jit(one)(*args1))[:, 1:-1]
    got = np.asarray(jax.jit(onep)(t[0], Hz, z_r))[:, 1:-1]
    scale = np.abs(ref).max() + 1e-30
    err = np.abs(got - ref).max() / scale
    msp = timeit(jax.jit(onep), (t[0], Hz, z_r)) * 1e3
    gbp = cost(onep, (t[0], Hz, z_r)) / 1e9
    print(f"pallas x1: {msp:.2f} ms, {gbp:.2f} GB "
          f"({gbp / fld:.0f} passes), rel err {err:.2e}")

    os.environ["ROMS_TPU_PALLAS_HMIX"] = "1"
    msf = timeit(jax.jit(lambda tt, tp, hz, zr: hmix.t3dmix2_geo(
        cfg, grid, tt, tp, hz, zr)), args) * 1e3
    print(f"t3dmix2_geo pallas: {msf:.2f} ms (vs {ms:.2f} jnp)")


if __name__ == "__main__":
    main()
