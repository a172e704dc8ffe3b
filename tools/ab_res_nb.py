#!/usr/bin/env python
"""Same-session A/B of resident fast-loop eta-block count (NB) and
engine on/off at BENCHMARK3 — one process, shared compile cache."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(tag, env):
    for k, v in env.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    import jax
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import benchmark
    cfg = benchmark.make_config(Lm=2048, Mm=256, N=30, dtype="float32",
                                full_physics=True)
    grid = benchmark.make_grid(cfg)
    state = benchmark.make_initial(cfg, grid)
    model = Model(cfg, grid, benchmark.make_bulk_forcing_fn(cfg, grid))
    s = state
    for _ in range(3):
        s = model.step(s)
    jax.block_until_ready(s.zeta)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        s = model.step(s)
    jax.block_until_ready(s.zeta)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"AB {tag}: {ms:.2f} ms/step", flush=True)
    return ms


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    measure("baseline(default NB)", {"ROMS_TPU_FASTLOOP_RES_NB": None})
    for nb in ("3", "6", "8"):
        measure(f"NB={nb}", {"ROMS_TPU_FASTLOOP_RES_NB": nb})
    measure("resident OFF", {"ROMS_TPU_FASTLOOP_RES": "0",
                             "ROMS_TPU_FASTLOOP_RES_NB": None})


if __name__ == "__main__":
    main()
