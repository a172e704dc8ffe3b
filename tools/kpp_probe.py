#!/usr/bin/env python
"""Decompose lmd_kpp cost on TPU: which sub-part burns the 21 ms?

Times isolated jits of: the 5 spline tridiagonal solves, _wscale,
the bulk-Ri assembly, the crossing search + gathers, and the full
lmd_vmix_interior / lmd_skpp, at BENCHMARK2 size.  Also prints each
part's XLA cost analysis (bytes accessed) to separate latency-bound
from bandwidth-bound.
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

    from roms_tpu.core import lmd as lmd_mod, set_vbc
    from roms_tpu.core.rho_eos import rho_eos
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import benchmark
    from roms_tpu.grid.depth import set_massflux
    from roms_tpu.ops import stencil as st

    cfg = benchmark.make_config(Lm=1024, Mm=128, N=30, dtype="float32",
                                full_physics=True)
    grid = benchmark.make_grid(cfg)
    state = benchmark.make_initial(cfg, grid)
    forcing_fn = benchmark.make_bulk_forcing_fn(cfg, grid)

    rho, pden, rhoA, rhoS, bvf = jax.jit(
        lambda s: rho_eos(cfg, s.t, s.z_r, s.Hz, s.z_w))(state)
    forcing = forcing_fn(state.time, state.t[0][-1], state.t[1][-1],
                         rho[-1])
    u, v, Hz, z_r, z_w, t = (state.u, state.v, state.Hz, state.z_r,
                             state.z_w, state.t)

    results = {}

    def probe(name, fn, args):
        jfn = jax.jit(fn)
        results[name] = (timeit(jfn, args), cost(fn, args))

    # 1 spline tridiagonal (the building block, 5 calls per step)
    probe("spline_ddz x1",
          lambda q, Hz: lmd_mod.spline_ddz(6.0 * (q[1:] - q[:-1]), Hz),
          (pden, Hz))
    # wscale at N interfaces
    Ustar = jnp.ones_like(state.zeta) * 0.01
    sig = jnp.abs(z_w[:-1])
    probe("wscale(N levels)",
          lambda U, s: lmd_mod._wscale(U[None], 0.4 * s * 1e-8, 0.4),
          (Ustar, sig))
    probe("alpha_beta", lambda t: lmd_mod._alpha_beta(cfg, t), (t,))
    probe("vmix_interior",
          lambda u, v, bvf, Hz: lmd_mod.lmd_vmix_interior(cfg, u, v, bvf,
                                                          Hz),
          (u, v, bvf, Hz))
    Akv0, Akt0 = jax.jit(
        lambda u, v, bvf, Hz: lmd_mod.lmd_vmix_interior(cfg, u, v, bvf,
                                                        Hz))(u, v, bvf, Hz)
    probe("skpp",
          lambda t, u, v, pden, bvf, Hz, z_r, z_w, Akv, Akt:
          lmd_mod.lmd_skpp(cfg, grid, t, u, v, pden, bvf, Hz, z_r, z_w,
                           forcing, Akv, Akt),
          (t, u, v, pden, bvf, Hz, z_r, z_w, Akv0, Akt0))

    def kpp_all(t, u, v, pden, bvf, Hz, z_r, z_w):
        Akv, Akt = lmd_mod.lmd_vmix_interior(cfg, u, v, bvf, Hz)
        return lmd_mod.lmd_skpp(cfg, grid, t, u, v, pden, bvf, Hz, z_r,
                                z_w, forcing, Akv, Akt)
    probe("kpp_all", kpp_all, (t, u, v, pden, bvf, Hz, z_r, z_w))

    print(f"# backend={jax.default_backend()} BM2 1024x128x30")
    for name, (tm, by) in results.items():
        ideal = by / (819e9) * 1e3 if by == by else float("nan")
        print(f"  {name:<22s} {tm*1e3:8.3f} ms   bytes={by:.2e} "
              f"(ideal {ideal:.2f} ms)")


if __name__ == "__main__":
    main()
