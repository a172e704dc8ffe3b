"""Wall-clock profiling regions.

The reference brackets every kernel with wclock_on/off over 88 named
regions and prints a reduced table at finalize (ROMS/Utility/timers.F:
98-313, mod_strings.F:138-250).  Under XLA the kernels fuse into one
program, so region timing is done at the Python orchestration level
(per-phase jitted sub-functions or whole-step granularity) plus the JAX
profiler for on-device traces.

Usage:
    prof = Profiler()
    with prof.region("step"):
        s = model.step(s)
    print(prof.report())

For device-level detail: Profiler.trace(path) wraps
jax.profiler.trace for TensorBoard/XProf consumption.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class Profiler:
    def __init__(self):
        self._acc = defaultdict(float)
        self._count = defaultdict(int)

    @contextlib.contextmanager
    def region(self, name: str, block: bool = True):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block:
                # ensure device work attributed to this region completes
                try:
                    jax.effects_barrier()
                except Exception:
                    pass
            self._acc[name] += time.perf_counter() - t0
            self._count[name] += 1

    @staticmethod
    @contextlib.contextmanager
    def trace(logdir: str):
        """On-device trace (jax profiler -> TensorBoard/xprof)."""
        with jax.profiler.trace(logdir):
            yield

    def report(self) -> str:
        total = sum(self._acc.values())
        lines = ["", " Elapsed wall CPU time per region (seconds):", ""]
        for name in sorted(self._acc, key=self._acc.get, reverse=True):
            t = self._acc[name]
            lines.append(f"  {name:<40s} {t:12.3f}  "
                         f"({100.0 * t / max(total, 1e-12):5.1f}%)  "
                         f"calls={self._count[name]}")
        lines.append(f"  {'TOTAL':<40s} {total:12.3f}")
        return "\n".join(lines)
