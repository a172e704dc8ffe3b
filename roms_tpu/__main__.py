"""Standalone driver: ``python -m roms_tpu roms_upwelling.in``.

The reference's user experience is `oceanM < roms.in` — the master
program (Master/roms.h:1-140) reads the deck, builds the application
selected at compile time, time-steps NTIMES baroclinic steps and
writes the output streams.  This module is that program for the TPU
model: the deck's MyAppCPP keyword selects the analytical application
(the ana_* functionals), every runtime keyword configures the model,
and io.output.OutputManager drives HIS/QCK/AVG/RST/STA/NINFO exactly
as the deck asks.

Usage:
  python -m roms_tpu ROMS/External/roms_upwelling.in \\
      [--ntimes N] [--outdir DIR] [--lm L --mm M --n K] [--dtype d]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time


def _app_module(name: str):
    from .functionals import benchmark, idealized, kelvin, upwelling
    name = (name or "UPWELLING").strip().upper()
    table = {
        "UPWELLING": (upwelling.make_config, upwelling.make_grid,
                      upwelling.make_initial, upwelling.make_forcing_fn,
                      getattr(upwelling, "make_vmix_fn", None)),
        "BENCHMARK": (benchmark.make_config, benchmark.make_grid,
                      benchmark.make_initial,
                      benchmark.make_bulk_forcing_fn, None),
        "KELVIN": (kelvin.make_config, kelvin.make_grid,
                   kelvin.make_initial, kelvin.make_forcing_fn, None),
        "SEAMOUNT": (idealized.seamount_config, idealized.seamount_grid,
                     idealized.seamount_initial,
                     lambda cfg, grid: idealized.zero_forcing(cfg),
                     None),
        "GRAV_ADJ": (idealized.grav_adj_config, idealized.grav_adj_grid,
                     idealized.grav_adj_initial,
                     lambda cfg, grid: idealized.zero_forcing(cfg),
                     None),
    }
    for key in table:
        if key in name:                    # e.g. "BENCHMARK3"
            return table[key]
    raise SystemExit(
        f"MyAppCPP '{name}' has no analytical functional here; "
        f"known: {', '.join(table)}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="python -m roms_tpu")
    p.add_argument("deck", help="reference-format roms_*.in input deck")
    p.add_argument("--ntimes", type=int, default=0,
                   help="override the deck's NTIMES")
    p.add_argument("--outdir", default=".")
    p.add_argument("--lm", type=int, default=0, help="override Lm")
    p.add_argument("--mm", type=int, default=0, help="override Mm")
    p.add_argument("--n", type=int, default=0, help="override N")
    p.add_argument("--dtype", default=None)
    args = p.parse_args(argv)

    from .core import stepping
    from .io.output import OutputManager
    from .io.roms_in import parse_roms_in, to_config

    import os
    os.makedirs(args.outdir, exist_ok=True)
    params = parse_roms_in(args.deck)
    title = params.get("TITLE", "")
    if isinstance(title, list):
        title = " ".join(str(x) for x in title)
    app = params.get("MyAppCPP", "UPWELLING")
    print(f"roms_tpu: {title}  [{app}]")

    mk_cfg, mk_grid, mk_init, mk_forc, mk_vmix = _app_module(app)
    over = {}
    if args.lm:
        over["Lm"] = args.lm
    if args.mm:
        over["Mm"] = args.mm
    if args.dtype:
        over["dtype"] = args.dtype
    cfg = to_config(params, **over)
    if args.n:
        cfg = cfg.replace(vert=dataclasses.replace(cfg.vert, N=args.n))
    if "BENCHMARK" in app.upper():
        # the app HEADER's compile-time physics (benchmark.h: LMD-KPP
        # + SOLAR_SOURCE + quadratic drag + nonlinear EOS) — runtime
        # keywords stay in control of dims/steps/cadences
        from .functionals import benchmark as _bm
        hdr = _bm.make_config(full_physics=True)
        cfg = cfg.replace(mixing=hdr.mixing, drag=hdr.drag,
                          eos=hdr.eos)

    grid = mk_grid(cfg)
    state = mk_init(cfg, grid)
    model = stepping.Model(
        cfg, grid, forcing_fn=mk_forc(cfg, grid),
        vmix_fn=mk_vmix(cfg) if mk_vmix else None)
    om = OutputManager(cfg, grid, params, outdir=args.outdir,
                       initial_state=state)
    if om.unsupported:
        print("unsupported output ids (skipped):",
              ", ".join(sorted(set(om.unsupported))))

    ntimes = args.ntimes or int(params.get("NTIMES", 0))
    print(f"stepping {ntimes} x dt={cfg.dt}s "
          f"(ndtfast={cfg.ndtfast}) on {cfg.Lm}x{cfg.Mm}x{cfg.N}")
    t0 = time.perf_counter()
    for _ in range(ntimes):
        state = model.step(state)
        om.step(state)
    import numpy as np
    import jax
    jax.block_until_ready(state.zeta)
    dt_wall = time.perf_counter() - t0
    om.close()
    if not np.isfinite(np.asarray(state.zeta)).all():
        print("BLOW-UP detected (non-finite zeta)", file=sys.stderr)
        return 1
    pts = cfg.Lm * cfg.Mm * cfg.N * max(ntimes, 1)
    print(f"done: {dt_wall:.2f}s wall "
          f"({pts / max(dt_wall, 1e-9):.3e} gridpoint-steps/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
