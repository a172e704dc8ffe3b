#!/usr/bin/env python
"""On-chip A/B of the VMEM-resident fast-loop engine.

Runs the full BENCHMARK baroclinic step with the resident engine ON vs
OFF on the real TPU: parity over a few steps, then steady-state timing.

Usage: python tools/fastloop_res_check.py [size] [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(resident, size, steps, parity_steps=3):
    os.environ["ROMS_TPU_FASTLOOP_RES"] = "1" if resident else "0"
    import jax
    from roms_tpu.core.stepping import Model
    from roms_tpu.functionals import benchmark

    Lm = 512 * (2 ** (size - 1))
    Mm = 64 * (2 ** (size - 1))
    cfg = benchmark.make_config(Lm=Lm, Mm=Mm, N=30, dtype="float32",
                                full_physics=True)
    grid = benchmark.make_grid(cfg)
    state = benchmark.make_initial(cfg, grid)
    model = Model(cfg, grid, benchmark.make_bulk_forcing_fn(cfg, grid))
    step = jax.jit(model._step_grid)
    s = state
    for _ in range(parity_steps):
        s = step(s, grid)
    jax.block_until_ready(s)
    snap = {f: __import__("numpy").asarray(getattr(s, f))
            for f in ("zeta", "ubar", "vbar", "u", "v", "t")}
    for _ in range(2):
        s = step(s, grid)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(steps):
        s = step(s, grid)
    jax.block_until_ready(s)
    wall = (time.perf_counter() - t0) / steps
    return snap, wall


def main():
    import numpy as np
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    mode = sys.argv[3] if len(sys.argv) > 3 else "both"

    if mode in ("both", "off"):
        snap0, t_off = run(False, size, steps)
        print(f"resident OFF: {t_off*1e3:.2f} ms/step", flush=True)
    if mode in ("both", "on"):
        snap1, t_on = run(True, size, steps)
        print(f"resident ON : {t_on*1e3:.2f} ms/step", flush=True)
    if mode == "both":
        for f in snap0:
            x, y = snap0[f], snap1[f]
            scale = np.abs(x).max() + 1e-30
            d = np.abs(y - x).max() / scale
            print(f"  {f}: rel drift {d:.2e} finite={np.isfinite(y).all()}")
        print(f"speedup on fast loop path: {t_off/t_on:.3f}x")


if __name__ == "__main__":
    main()
