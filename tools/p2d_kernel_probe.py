#!/usr/bin/env python
"""Standalone Mosaic-compile probe for the fused step2d substep kernel.

Compiles ONLY ops/pallas_step2d._substep_call (not the full model) on
the real TPU, walking the kernel's ROMS_TPU_P2D_TRUNC stages to locate
a Mosaic lowering crash.  Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/p2d_kernel_probe.py \
      [--mm 48] [--li 258] [--trunc 0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mm", type=int, default=48)
    p.add_argument("--li", type=int, default=258)
    p.add_argument("--trunc", type=int, default=0)
    p.add_argument("--interpret", action="store_true")
    args = p.parse_args()
    os.environ["ROMS_TPU_P2D_TRUNC"] = str(args.trunc)

    import jax
    import jax.numpy as jnp
    import numpy as np
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from roms_tpu.functionals import benchmark
    from roms_tpu.ops import pallas_step2d as p2d

    Mj, Li = args.mm + 2, args.li
    cfg = benchmark.make_config(Lm=Li - 2, Mm=Mj - 2, N=4,
                                dtype="float32")
    grid = benchmark.make_grid(cfg)
    rng = np.random.default_rng(0)

    def f2(scale=1e-3):
        return jnp.asarray(rng.normal(0, scale, (Mj, Li)),
                           jnp.float32)

    dyn = {name: f2() for name in p2d._DYN_TRIPLES}
    point = {name: f2() for name in p2d._POINTWISE}
    ks = int(os.environ.get("ROMS_TPU_P2D_KS", "1"))
    scal = jnp.tile(jnp.asarray([[1.0, 0.1, 0.2, 0.3, 1.0, 0.0, 0.0]],
                                jnp.float32), (ks, 1))
    out = p2d._substep_call(cfg, grid, dyn, point, scal, True,
                            args.interpret, BJ=8 * ks, KS=ks)
    jax.block_until_ready(out["zeta"])
    print(f"trunc={args.trunc} OK; zeta[0,:3]=",
          np.asarray(out["zeta"])[0, :3])


if __name__ == "__main__":
    main()
