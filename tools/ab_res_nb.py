#!/usr/bin/env python
"""Same-session A/B of resident fast-loop eta-block count (NB) and
engine on/off at BENCHMARK3 — one FRESH SUBPROCESS per measurement
(an INTERNAL tunnel error poisons the jax runtime and later
measurements read physically impossible times; bench.py learned this
in round 3)."""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(here)r)
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(%(here)r, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
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
import numpy as np
zs = float(np.asarray(s.zeta).sum())
ok = (ms > 2.0) and np.isfinite(zs)
print("RESULT", ms, zs, "ok" if ok else "IMPLAUSIBLE", flush=True)
"""


def measure(tag, env):
    e = dict(os.environ)
    e.pop("ROMS_TPU_FASTLOOP_RES_NB", None)
    e.pop("ROMS_TPU_FASTLOOP_RES", None)
    for k, v in env.items():
        if v is not None:
            e[k] = v
    r = subprocess.run([sys.executable, "-c", CHILD % {"here": HERE}],
                       env=e, capture_output=True, text=True,
                       timeout=2400)
    line = [ln for ln in r.stdout.splitlines()
            if ln.startswith("RESULT")]
    if not line:
        print(f"AB {tag}: FAILED rc={r.returncode} "
              f"{r.stderr[-300:]}", flush=True)
        return None
    _, ms, zs, ok = line[0].split()
    print(f"AB {tag}: {float(ms):.2f} ms/step ({ok})", flush=True)
    return float(ms) if ok == "ok" else None


def main():
    args = sys.argv[1:] or ["auto", "3", "6", "8", "off"]
    for a in args:
        if a == "auto":
            measure("baseline(default NB)", {})
        elif a == "off":
            measure("resident OFF", {"ROMS_TPU_FASTLOOP_RES": "0"})
        elif a == "fastmath-off":
            measure("fastmath OFF", {"ROMS_TPU_FASTMATH": "0"})
        elif a == "fastmath-on":
            measure("fastmath ON", {})
        else:
            measure(f"NB={a}", {"ROMS_TPU_FASTLOOP_RES_NB": a})


if __name__ == "__main__":
    main()
