#!/usr/bin/env python
"""Headline benchmark: BENCHMARK3-class channel throughput on one chip.

Runs the reference's scaling benchmark configuration (BENCHMARK3 grid
2048x256x30, dt=150 s, ndtfast=20; ROMS/External/roms_benchmark3.in:94-96,
231-233) with the FULL reference physics — LMD-KPP vertical mixing
(RIMIX+CONVEC+SKPP+NONLOCAL), COARE bulk fluxes with longwave/albedo,
solar source, MIX_GEO_TS, nonlinear EOS (ROMS/Include/benchmark.h:17-58)
— and reports sustained grid-point throughput:

    value = interior_points * baroclinic_steps / wall_seconds

The reference publishes no numbers (BASELINE.md), so vs_baseline is null
until Fortran reference timings are measured on comparable hardware.

Usage: python bench.py [--size 1|2|3] [--steps N] [--dtype float32]
                       [--variant full|light]
(--variant light: constant vmix + analytic constant-Cd stress, the
round-1 secondary metric for pure-throughput A/Bs)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=3, choices=[1, 2, 3],
                   help="BENCHMARK ladder rung (1: 512x64, 2: 1024x128, "
                        "3: 2048x256)")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--variant", default="full", choices=["full", "light"],
                   help="full: reference benchmark.h physics (KPP+COARE"
                        "+solar); light: constant vmix + analytic stress")
    args = p.parse_args()

    import jax
    # persistent compile cache: repeated bench invocations (and the
    # driver's end-of-round run) skip the multi-minute remote compile
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import benchmark

    Lm = 512 * (2 ** (args.size - 1))
    Mm = 64 * (2 ** (args.size - 1))
    N = 30
    full = args.variant == "full"
    cfg = benchmark.make_config(Lm=Lm, Mm=Mm, N=N, dtype=args.dtype,
                                full_physics=full)
    grid = benchmark.make_grid(cfg)
    state = benchmark.make_initial(cfg, grid)
    forcing_fn = (benchmark.make_bulk_forcing_fn(cfg, grid) if full
                  else benchmark.make_forcing_fn(cfg, grid))
    model = Model(cfg, grid, forcing_fn)

    # Single-step jit: one compile, steady-state throughput measured
    # over repeated calls.  (No buffer donation: the tunneled TPU
    # backend rejects aliased buffers.)
    step = jax.jit(model._step_grid)
    s = state
    for _ in range(args.warmup):
        s = step(s, grid)
    jax.block_until_ready(s)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        s = step(s, grid)
    jax.block_until_ready(s)
    wall = time.perf_counter() - t0

    points = Lm * Mm * N
    value = points * args.steps / wall
    suffix = "" if full else "_light"
    print(json.dumps({
        "metric": f"benchmark{args.size}_gridpoints_per_sec_per_chip"
                  + suffix,
        "value": round(value, 1),
        "unit": "gridpoint-steps/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
