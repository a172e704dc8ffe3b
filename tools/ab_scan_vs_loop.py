#!/usr/bin/env python
"""Same-session A/B: per-step async-dispatch loop vs lax.scan chunk at
BENCHMARK3 and BENCHMARK1 (bench methodology decision)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_size(Lm, Mm, N, steps):
    import jax
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import benchmark
    cfg = benchmark.make_config(Lm=Lm, Mm=Mm, N=N, dtype="float32",
                                full_physics=True)
    grid = benchmark.make_grid(cfg)
    state = benchmark.make_initial(cfg, grid)
    model = Model(cfg, grid, benchmark.make_bulk_forcing_fn(cfg, grid))
    step = jax.jit(model._step_grid)

    def run_n(s0, g, n):
        def body(c, _):
            return model.step_impl(c, g), None
        return jax.lax.scan(body, s0, None, length=n)[0]
    run_jit = jax.jit(run_n, static_argnums=2)

    s = state
    for _ in range(3):
        s = step(s, grid)
    jax.block_until_ready(s.zeta)
    best_loop = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            s = step(s, grid)
        jax.block_until_ready(s.zeta)
        best_loop = min(best_loop, (time.perf_counter() - t0) / steps)
    s2 = run_jit(state, grid, 3)
    jax.block_until_ready(s2.zeta)
    best_scan = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        s2 = run_jit(s2, grid, steps)
        jax.block_until_ready(s2.zeta)
        best_scan = min(best_scan, (time.perf_counter() - t0) / steps)
    print(f"AB size {Lm}x{Mm}x{N}: loop {best_loop*1e3:.2f} ms/step, "
          f"scan {best_scan*1e3:.2f} ms/step", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    bench_size(512, 64, 30, 20)       # BENCHMARK1
    bench_size(2048, 256, 30, 10)     # BENCHMARK3


if __name__ == "__main__":
    main()
