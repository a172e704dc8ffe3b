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
        "SOLITON": (idealized.soliton_config, idealized.soliton_grid,
                    idealized.soliton_initial,
                    lambda cfg, grid: idealized.zero_forcing(cfg),
                    None),
        "BASIN": (idealized.basin_config, idealized.basin_grid,
                  idealized.basin_initial, idealized.basin_forcing_fn,
                  None),
        "DOUBLE_GYRE": (idealized.double_gyre_config,
                        idealized.double_gyre_grid,
                        idealized.double_gyre_initial,
                        idealized.double_gyre_forcing_fn, None),
        # 6th element: extras(cfg, grid) -> dict of Model kwargs
        # (obc_fn, sources, ...)
        "CANYON": (idealized.canyon_config, idealized.canyon_grid,
                   idealized.canyon_initial,
                   lambda cfg, grid: idealized.zero_forcing(cfg),
                   None),
        "OVERFLOW": (idealized.overflow_config, idealized.overflow_grid,
                     idealized.overflow_initial,
                     lambda cfg, grid: idealized.zero_forcing(cfg),
                     None),
        "LAKE_SIGNELL": (idealized.lake_signell_config,
                         idealized.lake_signell_grid,
                         idealized.lake_signell_initial,
                         idealized.lake_signell_forcing_fn, None),
        "ESTUARY_TEST": (idealized.estuary_config, idealized.estuary_grid,
                         idealized.estuary_initial,
                         lambda cfg, grid: idealized.zero_forcing(cfg),
                         None,
                         lambda cfg, grid: {
                             "obc_fn": idealized.estuary_obc_fn(cfg,
                                                                grid)}),
        "RIVERPLUME1": (idealized.riverplume_config,
                        idealized.riverplume_grid,
                        idealized.riverplume_initial,
                        lambda cfg, grid: idealized.zero_forcing(cfg),
                        None,
                        lambda cfg, grid: {
                            "sources": idealized.riverplume_sources(
                                cfg, grid)}),
        "WINDBASIN": (idealized.windbasin_config,
                      idealized.windbasin_grid,
                      idealized.windbasin_initial,
                      idealized.windbasin_forcing_fn, None),
        "LMD_TEST": (idealized.lmd_test_config, idealized.lmd_test_grid,
                     idealized.lmd_test_initial,
                     idealized.lmd_test_forcing_fn, None),
        "MIXED_LAYER": (idealized.mixed_layer_config,
                        idealized.mixed_layer_grid,
                        idealized.mixed_layer_initial,
                        idealized.mixed_layer_forcing_fn, None),
        "SED_TOY": (idealized.sed_toy_config, idealized.sed_toy_grid,
                    idealized.sed_toy_initial,
                    lambda cfg, grid: idealized.zero_forcing(cfg),
                    None),
        "BL_TEST": (idealized.bl_test_config, idealized.bl_test_grid,
                    idealized.bl_test_initial,
                    idealized.bl_test_forcing_fn, None),
        "FLT_TEST": (idealized.flt_test_config, idealized.flt_test_grid,
                     idealized.flt_test_initial,
                     idealized.flt_test_forcing_fn, None),
        "SHOREFACE": (idealized.shoreface_config, idealized.shoreface_grid,
                      idealized.shoreface_initial,
                      lambda cfg, grid: idealized.zero_forcing(cfg),
                      None, idealized.shoreface_extras),
        "CHANNEL_NECK": (idealized.channel_neck_config,
                         idealized.channel_neck_grid,
                         idealized.channel_neck_initial,
                         idealized.channel_neck_forcing_fn,
                         idealized.channel_neck_vmix),
        "BIO_TOY": (idealized.bio_toy_config, idealized.bio_toy_grid,
                    idealized.bio_toy_initial,
                    idealized.bio_toy_forcing_fn, None),
        "WEDDELL": (idealized.weddell_config, idealized.weddell_grid,
                    idealized.weddell_initial,
                    lambda cfg, grid: idealized.zero_forcing(cfg),
                    None,
                    lambda cfg, grid: {
                        "obc_fn": idealized.weddell_obc_fn(cfg,
                                                           grid)}),
        "COUPLING_TEST": (idealized.coupling_test_config,
                          idealized.coupling_test_grid,
                          idealized.coupling_test_initial,
                          lambda cfg, grid: idealized.zero_forcing(cfg),
                          None),
        "LAKE_JERSEY": (idealized.lake_jersey_config,
                        idealized.lake_jersey_grid,
                        idealized.lake_jersey_initial,
                        idealized.lake_jersey_forcing_fn, None,
                        idealized.lake_jersey_extras),
        "TEST_HEAD": (idealized.test_head_config,
                      idealized.test_head_grid,
                      idealized.test_head_initial,
                      lambda cfg, grid: idealized.zero_forcing(cfg),
                      None, idealized.test_head_extras),
        "TEST_CHAN": (idealized.test_chan_config,
                      idealized.test_chan_grid,
                      idealized.test_chan_initial,
                      lambda cfg, grid: idealized.zero_forcing(cfg),
                      None,
                      lambda cfg, grid: {
                          "obc_fn": idealized.test_chan_obc_fn(cfg,
                                                               grid)}),
        "SED_TEST1": (idealized.sed_test1_config,
                      idealized.sed_test1_grid,
                      idealized.sed_test1_initial,
                      lambda cfg, grid: idealized.zero_forcing(cfg),
                      None, idealized.sed_test1_extras),
        "RIVERPLUME2": (idealized.riverplume2_config,
                        idealized.riverplume2_grid,
                        idealized.riverplume2_initial,
                        lambda cfg, grid: idealized.zero_forcing(cfg),
                        None, idealized.riverplume2_extras),
        "LAB_CANYON": (idealized.lab_canyon_config,
                       idealized.lab_canyon_grid,
                       idealized.lab_canyon_initial,
                       lambda cfg, grid: idealized.zero_forcing(cfg),
                       None),
        "CHANNEL": (idealized.channel_config, idealized.channel_grid,
                    idealized.channel_initial,
                    idealized.channel_forcing_fn, None),
        # multi-grid file-based apps: header-physics factory only;
        # grids/contacts come from GRDNAME/NGCNAME
        "DOGBONE": (idealized.dogbone_config, None, None,
                    lambda cfg, grid: idealized.zero_forcing(cfg),
                    None),
        # data-driven basins: header physics only, grid/ini from files
        "DAMEE_4": (idealized.damee4_config, None, None,
                    lambda cfg, grid: idealized.zero_forcing(cfg),
                    None),
        "WC13": (idealized.wc13_config, None, None,
                 lambda cfg, grid: idealized.zero_forcing(cfg),
                 None),
    }
    # Longest key first so e.g. "LAB_CANYON" matches its own entry,
    # not the shorter "CANYON" substring.
    for key in sorted(table, key=len, reverse=True):
        if key in name:                    # e.g. "BENCHMARK3"
            return table[key]
    return None                            # file-based app (GRDNAME etc.)


def _run_multigrid(args, params, deck_files):
    """Ngrids>1 deck path (nesting.F driver role): load the NGCNAME
    contact file, build one Model per grid from the per-grid deck
    columns, and advance the composite (bulk-synchronous donor
    exchange) or refined (two-way rf-substep) system with per-grid
    HIS output."""
    import numpy as np

    from .core import nesting, stepping
    from .core.state import initial_state
    from .functionals import idealized
    from .io.contact_nc import load_contact_netcdf
    from .io.grid_nc import load_grid_netcdf
    from .io.output import OutputManager
    from .io.roms_in import to_config

    ngc = deck_files("NGCNAME")
    contact = load_contact_netcdf(ngc[0])
    ngrids = contact["Ngrids"]
    print(f"multi-grid run: Ngrids={ngrids}, contact file {ngc[0]} "
          f"({len(contact['composite'])} composite regions, "
          f"{len(contact['refine'])} refinement pairs)")

    def per_grid(key, gi, default=None):
        v = params.get(key, default)
        if isinstance(v, list):
            return v[gi] if gi < len(v) else v[-1]
        return v

    app = params.get("MyAppCPP", "")
    mod = _app_module(app)
    mk_cfg = mod[0] if mod else None
    mk_forc = (mod[3] if mod else
               (lambda cfg, grid: idealized.zero_forcing(cfg)))

    grd = deck_files("GRDNAME")
    ini = deck_files("ININAME")
    models, states, oms = [], [], []
    for gi in range(ngrids):
        params_gi0 = dict(params)
        # scalarize the per-grid columns for this grid's config
        for key in ("Lm", "Mm", "N", "DT", "NDTFAST", "NTIMES"):
            if isinstance(params.get(key), list):
                params_gi0[key] = per_grid(key, gi)
        over = {}
        if args.lm:
            over["Lm"] = args.lm
        if args.mm:
            over["Mm"] = args.mm
        if args.dtype:
            over["dtype"] = args.dtype
        cfg = to_config(params_gi0, **over)
        if args.n:
            cfg = cfg.replace(vert=dataclasses.replace(cfg.vert,
                                                       N=args.n))
        if mk_cfg is not None:
            hdr = mk_cfg()
            cfg = cfg.replace(mixing=hdr.mixing, drag=hdr.drag,
                              eos=hdr.eos, bc=hdr.bc,
                              uv_cor=hdr.uv_cor)
        # contact edges become open (the reference decks mark them
        # Clo and let the nesting machinery override at contact
        # points, set_contact.F; here the LBC selection carries it)
        edges = {r.edge for r in contact["composite"]
                 if r.receiver == gi}
        for (dg, rg) in contact["refine"]:
            if rg == gi:
                edges = {"west", "east", "south", "north"}
        if edges:
            from . import config as _C
            import dataclasses as _dc

            def _upd(lbc, kind):
                return _dc.replace(lbc,
                                   **{e: kind for e in edges})
            bc = cfg.bc
            cfg = cfg.replace(bc=_dc.replace(
                bc, zeta=_upd(bc.zeta, _C.CLAMPED),
                ubar=_upd(bc.ubar, _C.FLATHER),
                vbar=_upd(bc.vbar, _C.FLATHER),
                u=_upd(bc.u, _C.RADIATION),
                v=_upd(bc.v, _C.RADIATION),
                t=_upd(bc.t, _C.RADIATION)))
        if gi < len(grd):
            grid = load_grid_netcdf(grd[gi], cfg)
        else:
            raise SystemExit(
                f"multi-grid deck: no GRDNAME file for grid {gi + 1}")
        if gi < len(ini):
            from .io.state_nc import read_state_netcdf
            state = read_state_netcdf(ini[gi], cfg, grid)
        else:
            state = initial_state(cfg, grid)
        model = stepping.Model(cfg, grid,
                               forcing_fn=mk_forc(cfg, grid))
        params_gi = dict(params_gi0)
        for key in ("HISNAME", "QCKNAME", "RSTNAME", "AVGNAME",
                    "DIANAME", "NHIS", "NQCK", "NRST", "NAVG",
                    "NDIA", "NSTA", "NINFO"):
            v = params.get(key)
            if isinstance(v, list):
                params_gi[key] = v[gi] if gi < len(v) else v[-1]
        om = OutputManager(cfg, grid, params_gi, outdir=args.outdir,
                           initial_state=state, model=model)
        om.dia = om.dia_uv = None      # budgets: single-grid path only
        models.append(model)
        states.append(state)
        oms.append(om)

    ntimes = args.ntimes or int(per_grid("NTIMES", 0, 0))
    cfgs = [m.cfg for m in models]
    t0 = time.perf_counter()
    if contact["composite"]:
        regions = contact["composite"]
        for n in range(ntimes):
            obcs = [nesting.composite_obc(states, cfgs, regions, r)
                    for r in range(ngrids)]
            states = [m.step_with_obc(sx, o)
                      for m, sx, o in zip(models, states, obcs)]
            for om, sx in zip(oms, states):
                om.step(sx)
    elif contact["refine"]:
        (dg, rg), spec = next(iter(contact["refine"].items()))
        nh = oms[dg].nhis or ntimes
        done = 0
        while done < ntimes:
            nwin = min(nh, ntimes - done)
            states[dg], states[rg] = nesting.run_two_way(
                models[dg], models[rg], spec, states[dg], states[rg],
                nwin, reflux=True)
            done += nwin
            oms[dg].step(states[dg])
            oms[rg].step(states[rg])
    else:
        raise SystemExit("contact file declares no usable contacts")
    import jax
    jax.block_until_ready(states[0].zeta)
    wall = time.perf_counter() - t0
    for om in oms:
        om.close()
    import numpy as _np2
    for gi, sx in enumerate(states):
        if not _np2.isfinite(_np2.asarray(sx.zeta)).all():
            print(f"BLOW-UP in grid {gi + 1}", file=sys.stderr)
            return 1
    pts = sum(c.Lm * c.Mm * c.N for c in cfgs) * max(ntimes, 1)
    print(f"done: {wall:.2f}s wall "
          f"({pts / max(wall, 1e-9):.3e} gridpoint-steps/s)")
    return 0


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
    p.add_argument("--mesh", default="",
                   help="ExX device mesh (e.g. 2x4): advance through "
                        "the explicit-halo sharded engine "
                        "(parallel.sharded_step)")
    p.add_argument("--sharded-out", default="",
                   help="with --mesh: write HIS records per-shard "
                        "into this tensorstore/zarr directory "
                        "(io.sharded_out; export with "
                        "tools/export_sharded_his.py) instead of the "
                        "single-host gathered NetCDF writer")
    p.add_argument("--platform", default="",
                   help="force the jax platform before backend init "
                        "(the axon sitecustomize pins jax_platforms, "
                        "so JAX_PLATFORMS=cpu in the environment is "
                        "ignored); with --mesh on cpu, enough virtual "
                        "host devices are created automatically")
    args = p.parse_args(argv)
    if args.platform:
        import os as _os
        if args.platform == "cpu" and args.mesh:
            need = 1
            for x in args.mesh.lower().split("x"):
                need *= int(x)
            _os.environ["XLA_FLAGS"] = (
                _os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={need}")
        import jax as _jax
        _jax.config.update("jax_platforms", args.platform)

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

    def _deck_files_early(key):
        import os as _os
        v = params.get(key)
        vs = v if isinstance(v, list) else [v]
        return [x for x in vs
                if isinstance(x, str) and _os.path.isfile(x)]

    ngrids_kw = params.get("Ngrids", 1)
    ngrids_kw = ngrids_kw[0] if isinstance(ngrids_kw, list) \
        else ngrids_kw
    if int(ngrids_kw or 1) > 1 and _deck_files_early("NGCNAME"):
        return _run_multigrid(args, params, _deck_files_early)

    mod = _app_module(app)
    if mod is None:
        # custom application: everything must come from NetCDF inputs
        from .core.state import initial_state
        from .functionals import idealized
        mod = (None, None,
               lambda cfg, grid: initial_state(cfg, grid),
               lambda cfg, grid: idealized.zero_forcing(cfg), None)
    mk_cfg, mk_grid, mk_init, mk_forc, mk_vmix = mod[:5]
    mk_extras = mod[5] if len(mod) > 5 else None
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
    elif mk_cfg is not None and any(k in app.upper() for k in
             ("CANYON", "OVERFLOW", "LAKE_SIGNELL", "ESTUARY_TEST",
              "RIVERPLUME", "WINDBASIN", "LMD_TEST", "MIXED_LAYER",
              "SED_TOY", "TEST_CHAN", "SED_TEST1", "CHANNEL",
              "BIO_TOY", "WEDDELL", "COUPLING_TEST", "LAKE_JERSEY",
              "TEST_HEAD", "DAMEE_4", "WC13", "CHANNEL_NECK")):
        # same header-physics merge for the newer analytical apps:
        # the factory carries the .h file's compile-time selections
        # (mixing closure, rotated diffusion, drag law, EOS, LBC set,
        # wet/dry)
        hdr = mk_cfg()
        cfg = cfg.replace(mixing=hdr.mixing, drag=hdr.drag,
                          eos=hdr.eos, bc=hdr.bc,
                          uv_cor=hdr.uv_cor, wetdry=hdr.wetdry,
                          Dcrit=hdr.Dcrit)

    # ---- file-based data path (realistic applications) -----------------
    # GRDNAME/ININAME/BRYNAME/CLMNAME/FRCNAME/NUDNAME deck keywords select
    # NetCDF inputs exactly as the reference does (get_grid.F,
    # get_state.F, get_data.F BRY/CLM/FRC branches); any keyword whose
    # file is absent falls back to the analytical functional.
    def deck_files(key):
        v = params.get(key)
        vs = v if isinstance(v, list) else [v]
        return [s for s in vs
                if isinstance(s, str) and os.path.isfile(s)]

    # ---- BPARNAM ecosystem deck (inp_par.F:168 read_BioPar chain) ------
    bio_deck = None
    bpar = deck_files("BPARNAM")
    if bpar:
        from .io.bio_in import load_bio_deck
        up = app.upper()
        bio_deck = load_bio_deck(
            bpar[0],
            carbon="CARBON" in up, oxygen="OXYGEN" in up)
        cfg = cfg.replace(NT=cfg.NAT + bio_deck.nbio)
        print(f"biology from {bpar[0]}: {bio_deck.model} "
              f"(+{bio_deck.nbio} tracers, NT={cfg.NT})")

    # ---- SPARNAM sediment deck (read_sedpar chain) ---------------------
    sed_deck = None
    spar = deck_files("SPARNAM")
    if spar:
        from .io.sed_in import load_sed_deck
        sed_deck = load_sed_deck(spar[0])
        cfg = cfg.replace(NT=cfg.NT + sed_deck.nsed)
        print(f"sediment from {spar[0]}: {sed_deck.nsed} classes "
              f"({', '.join(sed_deck.names)}, NT={cfg.NT})")

    grd = deck_files("GRDNAME")
    if grd:
        from .io.grid_nc import load_grid_netcdf
        grid = load_grid_netcdf(grd[0], cfg)
        print(f"grid from file: {grd[0]}")
    elif mk_grid is None:
        raise SystemExit(
            f"MyAppCPP '{app}' has no analytical functional here and "
            f"the deck names no existing GRDNAME grid file")
    else:
        grid = mk_grid(cfg)

    if cfg.nudg.luv_sponge or any(cfg.nudg.ltracer_sponge):
        # LuvSponge/LtracerSponge: amplified mixing near open edges.
        # Factors come from the grid file (visc_factor/diff_factor,
        # get_grid.F:376-420) when present, else a default edge ramp
        # (ana_sponge pattern).
        import numpy as _np
        from .core.climatology import apply_sponge, sponge_profile
        vfac = dfac = None
        if grd:
            from scipy.io import netcdf_file as _ncf
            _f = _ncf(grd[0], "r", mmap=False)
            if "visc_factor" in _f.variables:
                vfac = _np.asarray(_f.variables["visc_factor"][:])
            if "diff_factor" in _f.variables:
                dfac = _np.asarray(_f.variables["diff_factor"][:])
            _f.close()
        if vfac is None and dfac is None:
            vfac = dfac = sponge_profile(
                cfg, width=max(4, min(cfg.Lm, cfg.Mm) // 10),
                factor=4.0)
        grid = apply_sponge(grid,
                            vfac if vfac is not None else dfac,
                            uv=cfg.nudg.luv_sponge,
                            ts=any(cfg.nudg.ltracer_sponge),
                            amp_ts=dfac)
        print("sponge layers applied "
              f"(uv={cfg.nudg.luv_sponge}, "
              f"ts={any(cfg.nudg.ltracer_sponge)})")

    ini = deck_files("ININAME")
    if ini:
        from .io.state_nc import read_state_netcdf
        nrrec = int(params.get("NRREC", 0) or 0)
        state = read_state_netcdf(ini[0], cfg, grid,
                                  rec=nrrec - 1 if nrrec > 0 else -1)
        print(f"initial state from file: {ini[0]}")
    elif mk_init is not None:
        state = mk_init(cfg, grid)
    else:
        # data-driven app without ININAME: start from rest
        from .core.state import initial_state
        state = initial_state(cfg, grid)

    if (bio_deck is not None or sed_deck is not None) and \
            state.t.shape[0] < cfg.NT:
        # extend the tracer block: BioIni constants (ana_biology.h /
        # read_BioPar defaults) then sediment CSED concentrations
        import jax.numpy as _jnp
        inivals = []
        if bio_deck is not None:
            inivals += [bio_deck.bio_ini.get(sl, 0.1)
                        for sl in range(bio_deck.nbio)]
        if sed_deck is not None:
            inivals += list(sed_deck.csed)
        need = cfg.NT - state.t.shape[0]
        pads = [_jnp.full((1,) + state.t.shape[1:], v, state.t.dtype)
                for v in inivals[-need:]]
        t_ext = _jnp.concatenate([state.t] + pads, axis=0)
        state = state._replace(t=t_ext, t_prev=t_ext)
    if sed_deck is not None:
        from .core.sediment import initial_sed
        state = state._replace(
            sed=initial_sed(cfg, sed_deck.config))

    obc_fn = None
    bry = deck_files("BRYNAME")
    if bry:
        from .io.bry_nc import load_bry_netcdf, make_bry_obc_fn
        obc_fn = make_bry_obc_fn(cfg, load_bry_netcdf(bry, cfg))
        print(f"boundary data from: {', '.join(bry)}")
    tid = deck_files("TIDENAME")
    if tid:
        from .core.tides import make_tidal_obc_fn
        from .io.tide_nc import load_tide_netcdf
        tides = load_tide_netcdf(tid[0], cfg)
        obc_fn = make_tidal_obc_fn(
            tides, base_obc_fn=obc_fn,
            tide_start_days=float(params.get("TIDE_START", 0.0) or 0.0))
        print(f"tidal harmonics from: {tid[0]} "
              f"({tides.period.shape[0]} constituents)")

    clm_fn = None
    clm = deck_files("CLMNAME")
    if clm:
        from .io.clm_nc import (load_clm_netcdf, load_nudgcoef_netcdf,
                                make_clm_fn)
        nud = deck_files("NUDNAME")
        nudgcoef = (load_nudgcoef_netcdf(nud[0], cfg) if nud else None)
        if any(k.startswith("Lnudge") for k in params):
            # reference gating: Lnudge*CLM switches select what nudges
            # (read_phypar.F LnudgeTCLM/LnudgeM3CLM/LnudgeM2CLM)
            clm_fn = make_clm_fn(cfg, load_clm_netcdf(clm, cfg),
                                 nudgcoef=nudgcoef, nudg=cfg.nudg)
        else:
            # legacy decks without Lnudge lines: TNUDG>0 implies nudging
            tn = params.get("TNUDG", 0.0)
            tnudg = [float(x)
                     for x in (tn if isinstance(tn, list) else [tn])]
            clm_fn = make_clm_fn(
                cfg, load_clm_netcdf(clm, cfg), tnudg_days=tnudg,
                m3nudg_days=float(params.get("M3NUDG", 0.0) or 0.0),
                nudgcoef=nudgcoef)
        print(f"climatology from: {', '.join(clm)}")

    frc = deck_files("FRCNAME")
    if frc:
        from .io.forcing import (has_bulk_atm, load_forcing_auto,
                                 make_file_atm_fn, make_file_forcing_fn)
        ffields = load_forcing_auto(frc, cfg)
        if has_bulk_atm(ffields):
            from .core.bulk_flux import make_bulk_forcing
            forcing_fn = make_bulk_forcing(cfg,
                                           make_file_atm_fn(cfg, ffields))
            print(f"bulk-flux atmosphere from: {', '.join(frc)}")
        else:
            forcing_fn = make_file_forcing_fn(cfg, ffields)
            print(f"surface forcing from: {', '.join(frc)}")
    else:
        forcing_fn = mk_forc(cfg, grid)

    extras = mk_extras(cfg, grid) if mk_extras else {}
    if obc_fn is not None:
        extras["obc_fn"] = obc_fn       # file data overrides analytic
    if bio_deck is not None:
        extras["bio_fn"] = bio_deck.make_hook(cfg, grid)
    if sed_deck is not None:
        extras["sed_fn"] = sed_deck.make_hook(
            cfg, grid,
            offset=bio_deck.nbio if bio_deck is not None else 0)
    if frc:
        # surface wave data (get_data.F wave branch): rebind the app's
        # wave-driven hooks onto the file wave fields
        from .io.forcing import has_wave_fields, make_file_wave_fn
        if has_wave_fields(ffields):
            if "wec_fn" in extras:
                from .core.wec import make_wec_fn
                extras["wec_fn"] = make_wec_fn(
                    cfg, grid, make_file_wave_fn(cfg, ffields, "wec"),
                    stokes_coupling=True)
                print(f"WEC wave field from: {', '.join(frc)}")
            else:
                from .core.bbl import BBLConfig, make_ssw_bbl_fn
                extras["bbl_fn"] = make_ssw_bbl_fn(
                    cfg, BBLConfig(), grid,
                    make_file_wave_fn(cfg, ffields, "bbl"))
                print(f"SSW-BBL wave field from: {', '.join(frc)}")
    if frc:
        # QCORRECTION / SRELAXATION data (set_vbc.F:313-395): SST +
        # dQdSST heat-flux correction, SSS salt relaxation with the
        # deck's salinity TNUDG scale
        if "SST" in ffields or "SSS" in ffields:
            from .core.set_vbc import make_flux_correction
            tn = params.get("TNUDG", 0.0)
            tn = tn if isinstance(tn, list) else [tn]
            tnudg_s = float(tn[1] if len(tn) > 1 else tn[0] or 0.0)
            extras["flux_corr_fn"] = make_flux_correction(
                cfg, sst_fld=ffields.get("SST"),
                dqdt_fld=ffields.get("dQdSST"),
                sss_fld=ffields.get("SSS"), tnudg_s_days=tnudg_s,
                salt_mode=("srelaxation" if "SSS" in ffields
                           else "none"))
            print("surface flux corrections active "
                  f"(SST={'SST' in ffields}, SSS={'SSS' in ffields})")
    # ---- IPARNAM sea-ice deck (read_phypar.F:4273 ice_inp chain) -------
    ipar = deck_files("IPARNAM")
    if ipar:
        import jax.numpy as jnp
        from .core import seaice as _seaice
        from .io.ice_in import load_ice_deck
        ice_deck = load_ice_deck(ipar[0])
        if ice_deck.unknown:
            print(f"IPARNAM: unrecognized keywords "
                  f"{', '.join(ice_deck.unknown)}")
        if not (frc and ("Uwind" in ffields or "Tair" in ffields)):
            raise SystemExit(
                "IPARNAM sea ice needs an atmosphere: name an FRCNAME "
                "file with Uwind/Vwind/Tair (get_data.F ice branch)")
        Mj, Li = cfg.shape2d
        _z2 = jnp.zeros((Mj, Li), jnp.dtype(cfg.dtype))

        def ice_atm_fn(time, _ff=ffields, _z=_z2):
            uw = _ff["Uwind"].at(time) if "Uwind" in _ff else _z
            vw = _ff["Vwind"].at(time) if "Vwind" in _ff else _z
            ta = (_ff["Tair"].at(time) if "Tair" in _ff
                  else _z - 5.0)
            qao = (_ff["swrad"].at(time) if "swrad" in _ff else _z)
            return uw, vw, ta, qao

        extras["ice_fn"] = _seaice.make_ice_fn(
            cfg, ice_deck.config, grid, ice_atm_fn)
        if state.ice is None:
            state = state._replace(ice=_seaice.initial_ice(cfg))
        print(f"sea ice from {ipar[0]}: nEVP={ice_deck.config.nevp}, "
              f"Cd_ai={ice_deck.config.Cd_ai}")

    if extras.get("bbl_fn") is not None and state.bbl is None:
        from .core.bbl import initial_bbl
        state = state._replace(bbl=initial_bbl(cfg))
    model = stepping.Model(
        cfg, grid, forcing_fn=forcing_fn,
        vmix_fn=mk_vmix(cfg) if mk_vmix else None,
        obc_fn=extras.pop("obc_fn", None), clm_fn=clm_fn, **extras)
    sharded = None
    if args.mesh:
        # deck-driven multi-chip run: the explicit-halo engine with
        # the app's own forcing factory rebuilt block-locally
        import jax as _jax
        import numpy as _np
        from jax.sharding import Mesh as _Mesh
        neta, nxi = (int(x) for x in args.mesh.lower().split("x"))
        devs = _jax.devices()
        if len(devs) < neta * nxi:
            raise SystemExit(
                f"--mesh {args.mesh} needs {neta * nxi} devices, "
                f"found {len(devs)}")
        mesh = _Mesh(_np.asarray(devs[:neta * nxi]).reshape(neta, nxi),
                     ("eta", "xi"))
        from .parallel.sharded_step import ShardedStep
        factory = mk_forc if (not frc and mk_forc is not None) else None
        sharded = ShardedStep(model, mesh, forcing_factory=factory)
        print(f"sharded engine on {neta}x{nxi} mesh "
              f"(forcing {'in-region' if factory else 'global'})")
    om = OutputManager(cfg, grid, params, outdir=args.outdir,
                       initial_state=state, model=model)
    if om.unsupported:
        print("unsupported output ids (skipped):",
              ", ".join(sorted(set(om.unsupported))))

    ntimes = args.ntimes or int(params.get("NTIMES", 0))
    print(f"stepping {ntimes} x dt={cfg.dt}s "
          f"(ndtfast={cfg.ndtfast}) on {cfg.Lm}x{cfg.Mm}x{cfg.N}")
    t0 = time.perf_counter()
    # Chunked advance: when no stream needs every step (AVG/DIA
    # accumulate per step), run whole between-output windows inside one
    # jitted lax.scan — no per-step host dispatch (the reference's step
    # loop equally runs host-silent between output events).
    import math
    if om.avg is None and not om.wants_diag and not om.wants_diag_uv:
        cadences = [c for c in (om.nhis, om.nqck, om.nrst, om.nsta,
                                om.ninfo) if c]
        chunk = math.gcd(*cadences) if cadences else ntimes
    else:
        chunk = 1
    if sharded is not None and (om.wants_diag or om.wants_diag_uv):
        print("WARNING: --mesh run: DIA budget streams are disabled "
              "(not yet computed inside the sharded engine)",
              file=sys.stderr)
        for w in (om.dia, om.dia_uv):
            if w is not None:
                w.close()
        om.dia = om.dia_uv = None
    if sharded is not None:
        # blocked advance: state lives permanently as per-shard blocks;
        # unblock only at output events (no per-step round trips)
        import numpy as _np
        sw = None
        if args.sharded_out:
            from .io.sharded_out import ShardedHistoryWriter
            sw = ShardedHistoryWriter(args.sharded_out, cfg)
            om.his = None          # per-shard writes replace HIS
            print(f"sharded HIS -> {args.sharded_out} "
                  "(per-shard tensorstore writes)")
        blk = sharded.block_state(state)
        done = 0
        step_chunk = max(chunk, 1)
        while done < ntimes:
            n = min(step_chunk, ntimes - done)
            blk = sharded.run_blocked(blk, n)
            done += n
            if sw is not None and (done % max(om.nhis or n, 1)) == 0:
                sw.write_blocked(blk, sharded.lay,
                                 time=float(_np.asarray(blk.time)))
            state = sharded.unblock_state(blk)
            om.step(state)
        if sw is not None:
            sw.close()
        ntimes_left = 0
    elif chunk > 1 and ntimes >= chunk:
        print(f"advancing in jitted chunks of {chunk} steps")
        done = 0
        while done < ntimes:
            n = min(chunk, ntimes - done)
            state = model.run(state, n)
            done += n
            om.step(state)
        ntimes_left = 0
    else:
        ntimes_left = ntimes

    for _ in range(ntimes_left):
        if om.wants_diag and om.wants_diag_uv:
            if not hasattr(model, "_step_diag_both_jit"):
                import jax as _jax
                model._step_diag_both_jit = _jax.jit(
                    lambda s, g: model.step_impl(
                        s, g, collect_diag=True, collect_diag_uv=True))
            state, dia, dia_uv = model._step_diag_both_jit(state,
                                                          model.grid)
            om.step(state, diag=dia, diag_uv=dia_uv)
        elif om.wants_diag_uv:
            state, dia_uv = model.step_diag_uv(state)
            om.step(state, diag_uv=dia_uv)
        elif om.wants_diag:
            state, dia = model.step_diag(state)
            om.step(state, diag=dia)
        else:
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
