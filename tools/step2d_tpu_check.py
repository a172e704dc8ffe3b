#!/usr/bin/env python
"""Hardware parity check for the fused Pallas kernels: run N baroclinic
BENCHMARK steps on the real TPU with the kernels on vs off and compare
fields everywhere.  Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/step2d_tpu_check.py \
      [--lm 256] [--mm 48] [--n 30] [--steps 3] [--var VAR=0 ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(nsteps, Lm, Mm, N):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    from roms_tpu.core import stepping
    from roms_tpu.functionals import benchmark
    cfg = benchmark.make_config(Lm=Lm, Mm=Mm, N=N, dtype="float32")
    grid = benchmark.make_grid(cfg)
    s = benchmark.make_initial(cfg, grid)
    m = stepping.Model(cfg, grid,
                       forcing_fn=benchmark.make_forcing_fn(cfg, grid))
    for _ in range(nsteps):
        s = m.step(s)
    return s


def main():
    import numpy as np
    p = argparse.ArgumentParser()
    p.add_argument("--lm", type=int, default=256)
    p.add_argument("--mm", type=int, default=48)
    p.add_argument("--n", type=int, default=30)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--flag",
                   default="ROMS_TPU_PALLAS_STEP2D,ROMS_TPU_PALLAS_TADV,"
                           "ROMS_TPU_PALLAS_UV,ROMS_TPU_PALLAS_RHS3D,"
                           "ROMS_TPU_PALLAS_PRSGRD,ROMS_TPU_PALLAS_UVMIX,"
                           "ROMS_TPU_PALLAS_FLUX,ROMS_TPU_PALLAS_VDIFF",
                   help="comma-separated env flags to A/B (off vs on)")
    args = p.parse_args()

    flags = args.flag.split(",")
    for f in flags:
        os.environ[f] = "0"
    a = run(args.steps, args.lm, args.mm, args.n)
    for f in flags:
        os.environ[f] = "1"
    b = run(args.steps, args.lm, args.mm, args.n)

    worst = 0.0
    for f in ("zeta", "ubar", "vbar", "u", "v", "t"):
        x = np.asarray(getattr(a, f))
        y = np.asarray(getattr(b, f))
        ok = np.isfinite(y).all()
        scale = np.abs(x).max() + 1e-30
        rel = np.abs(y - x).max() / scale
        worst = max(worst, rel)
        print(f"{f:6s} finite={bool(ok)} max_rel={rel:.3e}")
        assert ok, f"non-finite in {f}"
    print("PASS" if worst < 1e-4 else "FAIL", f"worst={worst:.3e}")
    sys.exit(0 if worst < 1e-4 else 1)


if __name__ == "__main__":
    main()
