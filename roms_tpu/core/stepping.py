"""Baroclinic time-step orchestrator — the main3d of the TPU core.

One call = one full split-explicit baroclinic step (ROMS/Nonlinear/
main3d.F:216-1130), traced once under jit: prep (mass fluxes, EOS,
forcing, closures, omega), predictor stage (pre_step3d + pressure
gradient + RHS + mixing), the fast barotropic sub-cycle as a lax.scan,
then the 3D correctors.  The reference's kstp/krhs/knew/nstp/nrhs/nnew
slot rotation is resolved into the State dataflow (see core.state).
"""

from __future__ import annotations

import inspect
import os
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..grid.depth import set_depth, set_massflux
from ..grid.grid import Grid
from ..ops import stencil as st
from . import (climatology as clm_mod, gls as gls_mod, hmix,
               lmd as lmd_mod, omega as omega_mod, prsgrd, rhs3d, set_vbc)
from .pre_step3d import pre_step3d
from .rho_eos import rho_eos
from .state import Forcing, State
from .step2d import make_fast_loop
from .step3d_t import step3d_t
from .step3d_uv import step3d_uv
from .weights import power_law_weights


def make_bvf_mix(cfg: ModelConfig, bvf_nu0: float = 1.0e-7,
                 bvf_nu0c: float = 1.0, bvf_numin: float = 3.0e-5,
                 bvf_numax: float = 4.0e-4):
    """Brunt-Vaisala-frequency mixing (bvf_mix.F:88-115,
    mod_scalars.F:1883-1886 defaults):

        bvf < 0  ->  convective value bvf_nu0c (1 m2/s)
        bvf > 0  ->  clip(bvf_nu0 / sqrt(bvf), numin, numax)

    computed diagnostically from the time-n stratification."""
    from .rho_eos import rho_eos

    def vmix(state, grid, z_w):
        _, _, _, _, bvf = rho_eos(cfg, state.t, state.z_r, state.Hz,
                                  z_w)
        cff = bvf_nu0 / jnp.sqrt(jnp.maximum(bvf, 1.0e-20))
        stable = jnp.clip(cff, bvf_numin, bvf_numax)
        Ak_i = jnp.where(bvf < 0.0, bvf_nu0c,
                         jnp.where(bvf == 0.0, cfg.mixing.akv_bak,
                                   stable))
        # interface array with background top/bottom rows
        Akv = jnp.concatenate(
            [jnp.full_like(Ak_i[:1], cfg.mixing.akv_bak), Ak_i[1:-1],
             jnp.full_like(Ak_i[:1], cfg.mixing.akv_bak)], axis=0) \
            if Ak_i.shape[0] == cfg.N + 1 else Ak_i
        Akt = jnp.stack([Akv for _ in range(cfg.NAT)])
        return Akv, Akt

    return vmix


def default_vmix(cfg: ModelConfig):
    """Constant background vertical mixing (mod_mixing defaults)."""
    def vmix(state, grid, z_w):
        Akv = jnp.full_like(z_w, cfg.mixing.akv_bak)
        Akt = jnp.stack([jnp.full_like(z_w, ab)
                         for ab in cfg.mixing.akt_bak])
        return Akv, Akt
    return vmix


class Model:
    """Bundles static configuration with the jitted step function.

    forcing_fn(time) -> Forcing; vmix_fn(state, grid, z_w) -> (Akv, Akt).
    """

    def __init__(self, cfg: ModelConfig, grid: Grid,
                 forcing_fn: Callable, vmix_fn: Optional[Callable] = None,
                 var_rho: bool = True, obc_fn: Optional[Callable] = None,
                 clm_fn: Optional[Callable] = None,
                 bio_fn: Optional[Callable] = None,
                 sources=None, sed_fn: Optional[Callable] = None,
                 bbl_fn: Optional[Callable] = None,
                 eq_tide_fn: Optional[Callable] = None,
                 ice_fn: Optional[Callable] = None,
                 wec_fn: Optional[Callable] = None,
                 pair_fn: Optional[Callable] = None,
                 flux_corr_fn: Optional[Callable] = None):
        self.cfg = cfg
        self.grid = grid
        self.forcing_fn = forcing_fn
        # Bulk-flux style forcing needs the ocean surface state:
        # forcing(time, sst, sss, rho_surf) (bulk_flux.make_bulk_forcing)
        self._forcing_takes_state = (
            len(inspect.signature(forcing_fn).parameters) > 1)
        self.vmix_fn = vmix_fn or default_vmix(cfg)
        self.obc_fn = obc_fn
        self.clm_fn = clm_fn
        self.bio_fn = bio_fn
        self.sources = sources
        self.sed_fn = sed_fn
        self.bbl_fn = bbl_fn
        self.eq_tide_fn = eq_tide_fn
        self.flux_corr_fn = flux_corr_fn
        self.ice_fn = ice_fn
        self.wec_fn = wec_fn
        self.pair_fn = pair_fn
        # hooks grown a `waves=` kwarg accept coupled-import wave
        # fields (core/coupling.py ImportState Hwave/Dwave/Lwave/Pwave)
        def _takes_waves(fn):
            try:
                return fn is not None and \
                    "waves" in inspect.signature(fn).parameters
            except (TypeError, ValueError):
                return False
        self._bbl_takes_waves = _takes_waves(bbl_fn)
        self._wec_takes_waves = _takes_waves(wec_fn)
        self.nfast, w1, w2 = power_law_weights(cfg.ndtfast)
        if cfg.step2d == "fb":
            from .step2d_fb import make_fast_loop_fb
            self.fast_loop = make_fast_loop_fb(cfg, self.nfast, w1, w2,
                                               var_rho=var_rho)
        else:
            self.fast_loop = make_fast_loop(cfg, self.nfast, w1, w2,
                                            var_rho=var_rho)
        self._step_jit = jax.jit(self._step_grid)

    def _step_grid(self, state: State, grid: Grid) -> State:
        return self.step_impl(state, grid)

    def step_impl(self, state: State, grid: Optional[Grid] = None,
                  collect_diag: bool = False, obc_data=None,
                  forcing_override=None, forcing_adjust=None,
                  wave_override=None, collect_diag_uv: bool = False,
                  forcing_fn=None, fast_loop=None, clm_data=None,
                  eqt_data=None, pair_data=None,
                  collect_tfx: bool = False, sources_data=None,
                  bbl_fn=None, wec_fn=None, ice_fn=None):
        """One baroclinic step (main3d.F:216-1130).

        The trailing keyword hooks let a wrapper re-enter the SAME
        step dataflow with substituted pieces — the explicit-halo
        sharded engine (parallel.sharded_step) passes a block-local
        forcing_fn, a halo-refreshing fast_loop, and externally
        computed obc/clm/eq-tide/Pair data so every physics branch
        here is shared verbatim between the single-chip and multi-chip
        paths instead of being duplicated."""
        cfg = self.cfg
        grid = self.grid if grid is None else grid
        forcing_fn = forcing_fn or self.forcing_fn
        fast_loop = fast_loop or self.fast_loop
        bbl_fn = bbl_fn or self.bbl_fn
        wec_fn = wec_fn or self.wec_fn
        ice_fn = ice_fn or self.ice_fn
        sources = sources_data if sources_data is not None \
            else self.sources
        z_r, z_w, Hz = state.z_r, state.z_w, state.Hz
        iic = state.iic

        # ---- prep: fluxes, EOS, forcing, closures (main3d.F:348-535) ----
        from ..ops import pallas_flux
        fused_flux = (pallas_flux.use_pallas_flux(cfg)
                      and (sources is None
                           or sources.qsrc_u is None))
        if fused_flux:
            # fused set_massflux + omega kernel (ops/pallas_flux.py);
            # W is produced here and reused below
            Huon, Hvom, W_fused = pallas_flux.flux_omega_pallas(
                cfg, grid, state.u, state.v, Hz, z_w,
                interpret=pallas_flux._interp())
        else:
            Huon, Hvom = set_massflux(grid, state.u, state.v, Hz)
            if sources is not None and \
                    sources.qsrc_u is not None:
                # LuvSrc per-layer river flux through the faces feeds
                # continuity (omega) and advection (step3d LuvSrc block)
                Huon = Huon + sources.qsrc_u
                Hvom = Hvom + sources.qsrc_v
            if cfg.bc.ew_periodic:
                Huon, Hvom = st.periodic_x(Huon), st.periodic_x(Hvom)
            if cfg.bc.ns_periodic:
                Huon, Hvom = st.periodic_y(Huon), st.periodic_y(Hvom)
        from ..ops import pallas_prep, pallas_rho
        # Fused prep chain (ops/pallas_prep.py): rho_eos and KPP share
        # ONE launch; pden/bvf never round-trip through HBM.  The bulk
        # fluxes sit between them in dataflow, so the surface rho level
        # is computed standalone for the forcing call.
        use_prep = (pallas_prep.use_pallas_prep(cfg)
                    and cfg.mixing.vmix == "lmd"
                    and not cfg.mixing.bkpp and not cfg.mixing.ddmix
                    and bbl_fn is None)
        if use_prep:
            rho = pden = rhoA = rhoS = bvf = None
            rho_surf = pallas_prep.surface_rho(cfg, state.t, z_r)
        elif pallas_rho.use_pallas_rho(cfg):
            # fused column EOS kernel (ops/pallas_rho.py)
            import os as _os
            rho, pden, rhoA, rhoS, bvf = pallas_rho.rho_eos_pallas(
                cfg, state.t, z_r, Hz, z_w,
                interpret=bool(_os.environ.get(
                    "ROMS_TPU_PALLAS_KPP_INTERPRET")))
            rho_surf = rho[-1]
        else:
            rho, pden, rhoA, rhoS, bvf = rho_eos(cfg, state.t, z_r, Hz,
                                                 z_w)
            rho_surf = rho[-1]
        if self._forcing_takes_state:
            sss = state.t[1][-1] if cfg.NT > 1 \
                else jnp.zeros_like(rho_surf)
            forcing = forcing_fn(state.time, state.t[0][-1], sss,
                                 rho_surf)
        else:
            forcing = forcing_fn(state.time)
        if forcing_override is not None:
            # coupling imports (core/coupling.py): non-None fields of
            # the override pytree replace the computed forcing; passed
            # as a jit ARGUMENT so coupling windows reuse one trace
            for fname, val in forcing_override.items():
                if val is not None:
                    if fname == "stflx0":
                        forcing = forcing._replace(
                            stflx=forcing.stflx.at[0].set(val))
                    elif fname == "stflx1" and cfg.NT > 1:
                        forcing = forcing._replace(
                            stflx=forcing.stflx.at[1].set(val))
                    else:
                        forcing = forcing._replace(**{fname: val})
        if forcing_adjust is not None:
            # ADDITIVE surface-forcing adjustments — the 4D-Var control
            # path (frc_adjust.F semantics: the time-interpolated
            # adjustment increments the background forcing; keys:
            # sustr/svstr/srflx and stflx with a leading NAT axis)
            for fname, val in forcing_adjust.items():
                if val is None:
                    continue
                if fname == "stflx":
                    nat = val.shape[0]
                    forcing = forcing._replace(
                        stflx=forcing.stflx.at[:nat].add(val))
                else:
                    forcing = forcing._replace(
                        **{fname: getattr(forcing, fname) + val})
        ice_new = state.ice
        if ice_fn is not None:
            # sea-ice step before the ocean step (seaice.F driver
            # order); ice modifies surface stress and salt flux
            sss_srf = state.t[1][-1] if cfg.NT > 1 else \
                jnp.zeros_like(state.zeta)
            ice_new, tox, toy, isflx = ice_fn(
                state.time, state.ice, state.u[-1], state.v[-1],
                state.t[0][-1], sss_srf, state.zeta)
            stflx = forcing.stflx
            if cfg.NT > 1:
                stflx = stflx.at[1].add(isflx)
            # under-ice heat flux damping toward freezing is handled in
            # thermo; here only stress/salt feedback is applied
            forcing = forcing._replace(sustr=tox, svstr=toy,
                                       stflx=stflx)
        if self.flux_corr_fn is not None:
            # QCORRECTION / SCORRECTION / SRELAXATION flux corrections
            # (set_vbc.F:313-395): applied to the assembled stflx with
            # the model's own surface state
            forcing = self.flux_corr_fn(state.time, state.t, Hz,
                                        forcing)
        if getattr(grid, "zice", None) is not None:
            # ICESHELF cavities: zero surface fluxes and replace wind
            # stress with ice-cavity friction under the shelf
            # (set_vbc.F:423-560)
            forcing = set_vbc.apply_iceshelf(cfg, grid, state.u,
                                             state.v, z_r, z_w,
                                             forcing)
        if bbl_fn is not None:
            # wave-current BBL closure replaces the plain drag law
            # (bbl.F dispatch; mb_bbl.h)
            bbl_kw = {"waves": wave_override} \
                if (self._bbl_takes_waves and wave_override is not None) \
                else {}
            bblout = bbl_fn(state.time, state.bbl, state.u,
                            state.v, rho[0], z_r, z_w, **bbl_kw)
            bustr, bvstr = bblout.bustr, bblout.bvstr
            bbl_new = bblout.state
        else:
            bustr, bvstr = set_vbc.bottom_drag(cfg, grid, state.u,
                                               state.v, Hz, z_r, z_w)
            bbl_new = state.bbl
        use_gls = cfg.mixing.vmix in ("gls", "my25")
        ghats_flux = None
        if use_gls:
            Akv, Akt = state.mix.Akv, state.mix.Akt
        elif cfg.mixing.vmix == "lmd":
            # LMD-KPP (main3d.F:525-529): interior Ri mixing + surface
            # boundary layer, diagnostic from the time-n state.
            from ..ops import pallas_kpp
            if use_prep:
                import os as _os
                (rho, pden, rhoA, rhoS, Akv, Akt, ghats,
                 hsbl) = pallas_prep.prep_fused(
                    cfg, grid, state.t, state.u, state.v, Hz, z_r, z_w,
                    forcing,
                    interpret=bool(_os.environ.get(
                        "ROMS_TPU_PALLAS_KPP_INTERPRET")))
            elif (not cfg.mixing.bkpp and not cfg.mixing.ddmix
                    and pallas_kpp.use_pallas_kpp(cfg)):
                # fused single-pass Pallas kernel (~40x less HBM
                # traffic than the whole-array path; see
                # ops/pallas_kpp.py)
                import os as _os
                Akv, Akt, ghats, hsbl = pallas_kpp.lmd_kpp_fused(
                    cfg, grid, state.t, state.u, state.v, pden, bvf,
                    Hz, z_r, z_w, forcing,
                    interpret=bool(_os.environ.get(
                        "ROMS_TPU_PALLAS_KPP_INTERPRET")))
            else:
                Akv, Akt = lmd_mod.lmd_vmix_interior(cfg, state.u,
                                                     state.v, bvf, Hz)
                if cfg.mixing.ddmix:
                    # LMD_DDMIX: alpha/beta at interior W interfaces
                    # (rho_eos.F alfaobeta; T,S averaged to z_w)
                    from .rho_eos import eos_alpha_beta
                    t_i = 0.5 * (state.t[:, 1:] + state.t[:, :-1])
                    _, _, aob = eos_alpha_beta(cfg, t_i, z_w[1:-1],
                                               all_levels=True)
                    Akt = lmd_mod.lmd_ddmix(cfg, state.t, aob, Akt)
                Akv, Akt, ghats, hsbl = lmd_mod.lmd_skpp(
                    cfg, grid, state.t, state.u, state.v, pden, bvf, Hz,
                    z_r, z_w, forcing, Akv, Akt)
                if cfg.mixing.bkpp:
                    ksbl = jnp.maximum(jnp.sum(
                        (z_w[:-1] < hsbl[None]).astype(jnp.int32),
                        axis=0), 1)
                    Akv, Akt, hbbl = lmd_mod.lmd_bkpp(
                        cfg, grid, state.t, state.u, state.v, pden, bvf,
                        Hz, z_r, z_w, forcing, bustr, bvstr, Akv, Akt,
                        ksbl_guard=ksbl)
            ghats_flux = Akt * ghats
        else:
            Akv, Akt = self.vmix_fn(state, grid, z_w)
        if cfg.omega_implicit:
            # OMEGA_IMPLICIT: explicit part drives all explicit
            # advection; Wi is folded into the corrector solves.
            W, Wi = omega_mod.omega_split(cfg, grid, Huon, Hvom, z_w)
        elif fused_flux:
            W, Wi = W_fused, None
        else:
            W, Wi = omega_mod.omega(cfg, grid, Huon, Hvom, z_w), None
        if obc_data is not None:
            obc = obc_data        # explicit pytree argument (nesting)
        else:
            obc = self.obc_fn(state.time) if self.obc_fn else None
        clm = clm_data if clm_data is not None else (
            self.clm_fn(state.time) if self.clm_fn else None)

        # ---- predictor stage (rhs3d.F:80-189) ---------------------------
        t_half, t_part, u_part, v_part = pre_step3d(
            cfg, grid, state.u, state.v, state.t, state.t_prev,
            state.ru_prev, state.rv_prev, state.ru_prev2, state.rv_prev2,
            Hz, z_r, z_w, Huon, Hvom, W, forcing, bustr, bvstr, iic,
            ghats=ghats_flux)
        eqt = eqt_data if eqt_data is not None else (
            self.eq_tide_fn(state.time) if self.eq_tide_fn else None)
        pair = pair_data if pair_data is not None else (
            self.pair_fn(state.time) if self.pair_fn else None)
        if cfg.prsgrd in ("sj", "sj_wj"):
            ru, rv = prsgrd.prsgrd31(cfg, grid, rho, z_r, z_w, Hz,
                                     wj_gradp=(cfg.prsgrd == "sj_wj"))
        elif cfg.prsgrd == "fv":
            ru, rv = prsgrd.prsgrd40(cfg, grid, rho, z_r, z_w, Hz,
                                     eq_tide=eqt, Pair=pair)
        elif cfg.prsgrd == "q2":
            ru, rv = prsgrd.prsgrd42(cfg, grid, rho, z_r, z_w, Hz,
                                     eq_tide=eqt, Pair=pair)
        elif cfg.prsgrd == "q4":
            ru, rv = prsgrd.prsgrd44(cfg, grid, rho, z_r, z_w, Hz,
                                     eq_tide=eqt, Pair=pair)
        else:
            from ..ops import pallas_prsgrd
            if (pallas_prsgrd.use_pallas_prsgrd(cfg)
                    and getattr(grid, "zice", None) is None
                    and not (eqt is not None and pair is not None)):
                # fused splines density-Jacobian kernel
                # (ops/pallas_prsgrd.py; one VMEM pass, no HBM
                # intermediates)
                ru, rv = pallas_prsgrd.prsgrd32_pallas(
                    cfg, grid, rho, z_r, z_w, Hz, eq_tide=eqt,
                    Pair=pair, interpret=pallas_prsgrd._interp())
            else:
                ru, rv = prsgrd.prsgrd32(cfg, grid, rho, z_r, z_w, Hz,
                                         eq_tide=eqt, Pair=pair)
        if cfg.mixing.smagorinsky:
            visc3d_r, diff3d_r = hmix.smagorinsky_coef(cfg, grid,
                                                       state.u, state.v)
        else:
            visc3d_r = diff3d_r = None
        if cfg.mixing.mix_iso_ts:
            t_part = hmix.t3dmix2_iso(cfg, grid, state.t, t_part, Hz,
                                      z_r, pden)
        elif cfg.mixing.mix_geo_ts:
            t_part = hmix.t3dmix2_geo(cfg, grid, state.t, t_part, Hz, z_r)
        else:
            t_part = hmix.t3dmix2_s(cfg, grid, state.t, t_part, Hz,
                                    diff3d_r=diff3d_r)
        if cfg.mixing.mix_iso_ts:
            t_part = hmix.t3dmix4_iso(cfg, grid, state.t, t_part, Hz,
                                      z_r, pden)
        elif cfg.mixing.mix_geo_ts:
            t_part = hmix.t3dmix4_geo(cfg, grid, state.t, t_part, Hz,
                                      z_r)
        else:
            t_part = hmix.t3dmix4_s(cfg, grid, state.t, t_part, Hz)
        if self.bio_fn is not None:
            # ecosystem source/sink increment (main3d.F:1027, biology.F)
            t_part = t_part + Hz[None] * self.bio_fn(state.t, Hz, z_w,
                                                     forcing)
        sed_new = state.sed
        if self.sed_fn is not None:
            # sediment column processes (Sediment/sed_settling+sed_fluxes)
            sed_inc, sed_new = self.sed_fn(state.t, state.sed, Hz,
                                           bustr, bvstr)
            t_part = t_part + Hz[None] * sed_inc
        if sources is not None and sources.qsrc is not None:
            # LwSrc tracer mass injection (step3d_t.F:1500-1520)
            pmn_ = grid.pm * grid.pn
            t_part = t_part + cfg.dt * pmn_[None, None] * \
                sources.qsrc[None] * sources.tsrc
        if sources is not None and sources.qsrc_u is not None:
            # LuvSrc tracer input: correct the face-advected tracer to
            # the riverine concentration (advection carried ~t_cell
            # through the face; net input must be q*Tsrc)
            pmn_ = grid.pm * grid.pn
            qface = sources.qsrc_u + sources.qsrc_v
            t_part = t_part + cfg.dt * pmn_[None, None] * \
                qface[None] * (sources.tsrc - state.t)
        if collect_diag_uv:
            # DIAGNOSTICS_UV decomposition (set_diags.F): accumulate
            # the RHS in the same order as rhs3d_momentum so the sum
            # is arithmetically identical to the jnp path
            ru_pgrd, rv_pgrd = ru, rv
            cor_u = cor_v = 0.0
            if cfg.uv_cor:
                cu, cv = rhs3d.coriolis(cfg, grid, state.u, state.v,
                                        Hz)
                ru, rv = ru + cu, rv + cv
                cor_u, cor_v = cu, cv
            if cfg.curvgrid and cfg.uv_adv:
                cu, cv = rhs3d.curv_metric(cfg, grid, state.u,
                                           state.v, Hz)
                ru, rv = ru + cu, rv + cv
                cor_u, cor_v = cor_u + cu, cor_v + cv
            hadv_u = hadv_v = vadv_u = vadv_v = 0.0
            if cfg.uv_adv:
                hu, hv = rhs3d.hadv_uv(cfg, grid, state.u, state.v,
                                       Huon, Hvom)
                ru, rv = ru + hu, rv + hv
                hadv_u, hadv_v = hu, hv
                wu, wv = rhs3d.vadv_uv(cfg, state.u, state.v, W)
                ru, rv = ru + wu, rv + wv
                vadv_u, vadv_v = wu, wv
        else:
            ru, rv = rhs3d.rhs3d_momentum(cfg, grid, state.u, state.v,
                                          Hz, Huon, Hvom, W, ru, rv)
        stokes2d = None
        if wec_fn is not None and hasattr(wec_fn, "stokes"):
            # full Lagrangian WEC coupling: Stokes transports enter the
            # barotropic continuity and the 3D mass fluxes
            wec_kw = {"waves": wave_override} \
                if (self._wec_takes_waves and wave_override is not None) \
                else {}
            DU_st, DV_st, Huon_st, Hvom_st = wec_fn.stokes(
                state.time, Hz, z_r, z_w, **wec_kw)
            stokes2d = (DU_st, DV_st)
            Huon = Huon + Huon_st
            Hvom = Hvom + Hvom_st
        if wec_fn is not None:
            # wave-effect-on-currents vortex force (rhs3d.F:534-562)
            wec_kw = {"waves": wave_override} \
                if (self._wec_takes_waves and wave_override is not None) \
                else {}
            ru, rv = wec_fn(state.time, state.u, state.v, Hz,
                            z_r, z_w, ru, rv, **wec_kw)
        ru, rv = clm_mod.nudge_momentum_rhs(cfg, grid, clm, state.u,
                                            state.v, Hz, ru, rv)
        if collect_diag_uv:
            u_part_pre, v_part_pre = u_part, v_part
        rufrc, rvfrc = rhs3d.integrate_rufrc(cfg, grid, ru, rv, forcing,
                                             bustr, bvstr)
        rufrc, rvfrc = clm_mod.nudge_momentum2d_rhs(
            cfg, grid, clm, state.zeta, state.ubar, state.vbar,
            rufrc, rvfrc)
        if cfg.mixing.mix_geo_uv:
            u_part, v_part, rufrc, rvfrc = hmix.uv3dmix2_geo(
                cfg, grid, state.u, state.v, u_part, v_part, Hz, z_r,
                rufrc, rvfrc, visc3d_r=visc3d_r)
        else:
            u_part, v_part, rufrc, rvfrc = hmix.uv3dmix2_s(
                cfg, grid, state.u, state.v, u_part, v_part, Hz, rufrc,
                rvfrc, visc3d_r=visc3d_r)
        if cfg.mixing.mix_geo_uv:
            u_part, v_part, rufrc, rvfrc = hmix.uv3dmix4_geo(
                cfg, grid, state.u, state.v, u_part, v_part, Hz, z_r,
                rufrc, rvfrc)
        else:
            u_part, v_part, rufrc, rvfrc = hmix.uv3dmix4_s(
                cfg, grid, state.u, state.v, u_part, v_part, Hz,
                rufrc, rvfrc)
        if use_gls:
            # gls_prestep (main3d.F:634-636): AB2 advection of tke/psi
            tke_half, gls_half, tke_seed, gls_seed = gls_mod.gls_prestep(
                cfg, grid, state.mix, Huon, Hvom, W, Hz, iic)

        # ---- fast barotropic sub-cycle (main3d.F:810-918) ---------------
        (avg, rufrc_eff, rvfrc_eff, _, _, _) = fast_loop(
            grid, state.zeta, state.ubar, state.vbar, rufrc, rvfrc,
            rhoS, rhoA,
            state.ru0_prev, state.rv0_prev,
            state.ru0_prev2, state.rv0_prev2, iic, obc,
            sources, stokes2d)

        # ---- new depths from the filtered free surface (main3d.F:963) ---
        z_r2, z_w2, Hz2 = set_depth(grid, avg.Zt_avg1)

        # ---- correctors (main3d.F:990-1045) -----------------------------
        if collect_diag_uv:
            un, vn, ubar, vbar, Huon2, Hvom2, dia_uv = step3d_uv(
                cfg, grid, u_part, v_part, ru, rv, Hz2, z_r2, Akv,
                avg, Huon, Hvom, iic, u_old=state.u, v_old=state.v,
                obc=obc, Wi=Wi, collect_diag=True)
        else:
            un, vn, ubar, vbar, Huon2, Hvom2 = step3d_uv(
                cfg, grid, u_part, v_part, ru, rv, Hz2, z_r2, Akv,
                avg, Huon, Hvom, iic, u_old=state.u, v_old=state.v,
                obc=obc, Wi=Wi)
        if cfg.wetdry:
            # 3D wet/dry coupling (step3d_uv.F WET_DRY): gate the new
            # baroclinic momentum with the filtered-free-surface masks
            from . import wetdry as wd
            wm = wd.compute_wet_masks(cfg, grid, avg.Zt_avg1)
            un = wd.mask_momentum(un, wm.umask_wet[None])
            vn = wd.mask_momentum(vn, wm.vmask_wet[None])
        if cfg.omega_implicit:
            W2, Wi2 = omega_mod.omega_split(cfg, grid, Huon2, Hvom2,
                                            z_w2)
        elif fused_flux:
            W2, Wi2 = pallas_flux.omega_pallas(
                cfg, grid, Huon2, Hvom2, z_w2,
                interpret=pallas_flux._interp()), None
        else:
            W2, Wi2 = omega_mod.omega(cfg, grid, Huon2, Hvom2,
                                      z_w2), None
        if use_gls:
            # gls_corstep / my25_corstep (main3d.F:1019-1021) runs
            # before step3d_t so tracers diffuse with the updated Akt.
            if cfg.mixing.vmix == "my25":
                from . import my25 as my25_mod
                mix_new = my25_mod.my25_corstep(
                    cfg, grid, state.mix, tke_half, gls_half, tke_seed,
                    gls_seed, state.u, state.v, Hz2, z_r2, z_w2,
                    Huon2, Hvom2, W2, bvf, forcing.sustr, forcing.svstr,
                    bustr, bvstr)
            else:
                mix_new = gls_mod.gls_corstep(
                    cfg, grid, state.mix, tke_half, gls_half, tke_seed,
                    gls_seed, state.u, state.v, Hz2, z_r2, z_w2,
                    Huon2, Hvom2, W2, bvf, forcing.sustr, forcing.svstr,
                    bustr, bvstr)
            Akt_t = mix_new.Akt
        else:
            mix_new = state.mix
            Akt_t = Akt
        tfx = None
        if collect_diag and collect_tfx:
            tn, tdia, tfx = step3d_t(cfg, grid, t_half, t_part, Huon2,
                                     Hvom2, W2, Hz2, z_r2, Akt_t,
                                     t_old=state.t, obc=obc, Wi=Wi2,
                                     collect_diag=True,
                                     collect_tfx=True)
        elif collect_diag:
            tn, tdia = step3d_t(cfg, grid, t_half, t_part, Huon2,
                                Hvom2, W2, Hz2, z_r2, Akt_t,
                                t_old=state.t, obc=obc, Wi=Wi2,
                                collect_diag=True)
        elif collect_tfx:
            tn, tfx = step3d_t(cfg, grid, t_half, t_part, Huon2,
                               Hvom2, W2, Hz2, z_r2, Akt_t,
                               t_old=state.t, obc=obc, Wi=Wi2,
                               collect_tfx=True)
        else:
            tn = step3d_t(cfg, grid, t_half, t_part, Huon2, Hvom2, W2,
                          Hz2, z_r2, Akt_t, t_old=state.t, obc=obc,
                          Wi=Wi2)
        tn_pre_nudge = tn
        tn = clm_mod.nudge_tracers(cfg, clm, tn)

        if collect_diag:
            # DIAGNOSTICS_TS budget (set_diags.F): Hz-weighted
            # per-step increments; forc lumps surface fluxes, hmix,
            # biology, sediment and point sources from the predictor.
            diag = {
                "rate": Hz2[None] * tn - state.Hz[None] * state.t,
                "forc": t_part - state.Hz[None] * state.t,
                "hadv": tdia["hadv"],
                "vadv": tdia["vadv"],
                "vdif": tdia["vdif"],
                "nudg": Hz2[None] * (tn - tn_pre_nudge),
            }
        if collect_diag_uv:
            # DIAGNOSTICS_UV budget (set_diags.F): Hz-weighted per-step
            # momentum increments; rate = pre + prsgrd + cor + hadv +
            # vadv + hvisc + vvisc + cpl, closing to roundoff
            Hzu_old = 0.5 * (state.Hz + st.im1(state.Hz))
            Hzv_old = 0.5 * (state.Hz + st.jm1(state.Hz))
            DC0u, DC0v = dia_uv["DC0u"], dia_uv["DC0v"]

            def _b3u(x):
                return jnp.broadcast_to(x, un.shape)

            def _b3v(x):
                return jnp.broadcast_to(x, vn.shape)

            diag_uv = {
                "u_rate": dia_uv["Hz_u"] * un - Hzu_old * state.u,
                "v_rate": dia_uv["Hz_v"] * vn - Hzv_old * state.v,
                "u_pre": u_part_pre - Hzu_old * state.u,
                "v_pre": v_part_pre - Hzv_old * state.v,
                "u_hvisc": u_part - u_part_pre,
                "v_hvisc": v_part - v_part_pre,
                "u_prsgrd": DC0u * ru_pgrd,
                "v_prsgrd": DC0v * rv_pgrd,
                "u_cor": _b3u(DC0u * cor_u),
                "v_cor": _b3v(DC0v * cor_v),
                "u_hadv": _b3u(DC0u * hadv_u),
                "v_hadv": _b3v(DC0v * hadv_v),
                "u_vadv": _b3u(DC0u * vadv_u),
                "v_vadv": _b3v(DC0v * vadv_v),
                "u_vvisc": dia_uv["vvisc_u"],
                "v_vvisc": dia_uv["vvisc_v"],
                "u_cpl": dia_uv["cpl_u"], "v_cpl": dia_uv["cpl_v"],
            }
        new_state = State(
            time=state.time + cfg.dt, iic=iic + 1,
            zeta=avg.Zt_avg1, ubar=ubar, vbar=vbar,
            u=un, v=vn, t=tn, t_prev=state.t,
            ru_prev=ru, rv_prev=rv,
            ru_prev2=state.ru_prev, rv_prev2=state.rv_prev,
            ru0_prev=rufrc_eff, rv0_prev=rvfrc_eff,
            ru0_prev2=state.ru0_prev, rv0_prev2=state.rv0_prev,
            z_r=z_r2, z_w=z_w2, Hz=Hz2, mix=mix_new, sed=sed_new,
            bbl=bbl_new, ice=ice_new)
        if collect_diag and collect_diag_uv:
            return new_state, diag, diag_uv
        if collect_diag_uv:
            return new_state, diag_uv
        if collect_diag:
            return new_state, diag
        if collect_tfx:
            return new_state, tfx
        return new_state

    def step(self, state: State) -> State:
        return self._step_jit(state, self.grid)

    def diagnose(self, state: State) -> dict:
        """Write-time diagnostic fields (wrt_his.F derived quantities):
        the surface forcing actually applied this step, bottom stress
        (plain drag or BBL), and for LMD-KPP runs the diagnostic mixing
        coefficients and boundary-layer depths that the reference
        writes as AKv/AKt/AKs/Hsbl/Hbbl.  One jitted evaluation of the
        step's prep phase — numerics identical to step_impl."""
        if not hasattr(self, "_diag_fields_jit"):
            cfg = self.cfg

            def compute(state, grid):
                z_r, z_w, Hz = state.z_r, state.z_w, state.Hz
                rho, pden, _, _, bvf = rho_eos(cfg, state.t, z_r, Hz,
                                               z_w)
                sss = state.t[1][-1] if cfg.NT > 1 else \
                    jnp.zeros_like(rho[-1])
                if self._forcing_takes_state:
                    forcing = self.forcing_fn(state.time, state.t[0][-1],
                                              sss, rho[-1])
                else:
                    forcing = self.forcing_fn(state.time)
                out = {"sustr": forcing.sustr, "svstr": forcing.svstr,
                       "shflux": forcing.stflx[0],
                       "swrad": forcing.srflx}
                if cfg.NT > 1:
                    out["ssflux"] = forcing.stflx[1]
                if hasattr(self.forcing_fn, "components"):
                    # bulk-flux write-time components (wrt_his.F
                    # idLrad/idLhea/idShea/idEmPf/idrain + atmosphere)
                    out.update(self.forcing_fn.components(
                        state.time, state.t[0][-1],
                        state.t[1][-1] if cfg.NT > 1 else sss,
                        rho[-1]))
                if self.bbl_fn is not None:
                    bblout = self.bbl_fn(state.time, state.bbl, state.u,
                                         state.v, rho[0], z_r, z_w)
                    bustr, bvstr = bblout.bustr, bblout.bvstr
                else:
                    bustr, bvstr = set_vbc.bottom_drag(
                        cfg, grid, state.u, state.v, Hz, z_r, z_w)
                out["bustr"] = bustr
                out["bvstr"] = bvstr
                if cfg.mixing.vmix == "lmd":
                    Akv, Akt = lmd_mod.lmd_vmix_interior(
                        cfg, state.u, state.v, bvf, Hz)
                    Akv, Akt, ghats, hsbl = lmd_mod.lmd_skpp(
                        cfg, grid, state.t, state.u, state.v, pden, bvf,
                        Hz, z_r, z_w, forcing, Akv, Akt)
                    if cfg.mixing.bkpp:
                        ksbl = jnp.maximum(jnp.sum(
                            (z_w[:-1] < hsbl[None]).astype(jnp.int32),
                            axis=0), 1)
                        Akv, Akt, hbbl = lmd_mod.lmd_bkpp(
                            cfg, grid, state.t, state.u, state.v, pden,
                            bvf, Hz, z_r, z_w, forcing, bustr, bvstr,
                            Akv, Akt, ksbl_guard=ksbl)
                        out["hbbl"] = hbbl
                    out["AKv"] = Akv
                    out["AKt"] = Akt[0]
                    if cfg.NT > 1:
                        out["AKs"] = Akt[1]
                    out["hsbl"] = hsbl
                elif cfg.mixing.vmix not in ("gls", "my25"):
                    Akv, Akt = self.vmix_fn(state, grid, z_w)
                    out["AKv"] = Akv
                    out["AKt"] = Akt[0]
                    if cfg.NT > 1:
                        out["AKs"] = Akt[1]
                return out

            self._diag_fields_jit = jax.jit(compute)
        return self._diag_fields_jit(state, self.grid)

    def step_with_forcing(self, state: State, override: dict,
                          waves: Optional[dict] = None):
        """One step with selected forcing fields replaced by the
        entries of `override` (keys: sustr/svstr/srflx/stflx0/stflx1)
        and, optionally, imported wave fields (keys Hwave/Dwave/Lwave/
        Pwave) feeding the BBL/WEC hooks — all passed as jit arguments
        (coupling windows, core/coupling.py)."""
        if waves is not None:
            if not hasattr(self, "_step_forc_wave_jit"):
                self._step_forc_wave_jit = jax.jit(
                    lambda s, g, o, w: self.step_impl(
                        s, g, forcing_override=o, wave_override=w))
            return self._step_forc_wave_jit(state, self.grid, override,
                                            waves)
        if not hasattr(self, "_step_forc_jit"):
            self._step_forc_jit = jax.jit(
                lambda s, g, o: self.step_impl(s, g,
                                               forcing_override=o))
        return self._step_forc_jit(state, self.grid, override)

    def step_with_obc(self, state: State, obc_data):
        """One step with boundary data passed as a pytree ARGUMENT
        (not baked into the trace) — required when the data changes
        between jitted calls, e.g. nested-grid windows."""
        if not hasattr(self, "_step_obc_jit"):
            self._step_obc_jit = jax.jit(
                lambda s, g, o: self.step_impl(s, g, obc_data=o))
        return self._step_obc_jit(state, self.grid, obc_data)

    def step_tfx(self, state: State, obc_data=None):
        """One step returning (new_state, corrector tracer face
        fluxes {'FX','FE'} (NT,N,Mj,Li)) — the two-way nesting
        refluxing inputs (nesting.F:3047-3459 correct_tracer)."""
        if not hasattr(self, "_step_tfx_jit"):
            self._step_tfx_jit = jax.jit(
                lambda s, g, o: self.step_impl(s, g, obc_data=o,
                                               collect_tfx=True))
        return self._step_tfx_jit(state, self.grid, obc_data)

    def step_diag(self, state: State):
        """One step returning (new_state, DIAGNOSTICS_TS budget dict of
        Hz-weighted per-step increments): rate = forc + hadv + vadv +
        vdif + nudg, closing to roundoff in the interior."""
        if not hasattr(self, "_step_diag_jit"):
            self._step_diag_jit = jax.jit(
                lambda s, g: self.step_impl(s, g, collect_diag=True))
        return self._step_diag_jit(state, self.grid)

    def step_diag_uv(self, state: State):
        """One step returning (new_state, DIAGNOSTICS_UV budget dict)
        of Hz-weighted per-step momentum increments (set_diags.F DIA
        u/v term budgets): rate = pre + prsgrd + cor + hadv + vadv +
        hvisc + vvisc + cpl to roundoff."""
        if not hasattr(self, "_step_diag_uv_jit"):
            self._step_diag_uv_jit = jax.jit(
                lambda s, g: self.step_impl(s, g,
                                            collect_diag_uv=True))
        return self._step_diag_uv_jit(state, self.grid)

    def sharded_stepper(self, mesh, nghost: int = 14,
                        refresh_every: int = 2):
        """The production multi-chip engine: the full baroclinic step
        in one shard_map region with explicit staged halo refreshes
        (parallel.sharded_step.ShardedStep; ~24 collective-permutes
        per compiled step vs ~900 for the GSPMD whole-array path).
        Supported class: EW-periodic / NS-walled channel domains."""
        from ..parallel.sharded_step import ShardedStep
        return ShardedStep(self, mesh, nghost=nghost,
                           refresh_every=refresh_every)

    def run(self, state: State, nsteps: int) -> State:
        """Advance nsteps inside a single jitted scan (compiled once
        per distinct nsteps)."""
        cache = getattr(self, "_run_jit_cache", None)
        if cache is None:
            cache = self._run_jit_cache = {}
        if nsteps not in cache:
            def scan_run(s, g):
                def body(c, _):
                    return self.step_impl(c, g), None
                return jax.lax.scan(body, s, None, length=nsteps)[0]
            cache[nsteps] = jax.jit(scan_run)
        return cache[nsteps](state, self.grid)
