"""LMD double-diffusive mixing (LMD_DDMIX, lmd_vmix.F:363-429) and
BODYFORCE wind-stress deposition (rhs3d.F BODYFORCE/LEVSFRC) tests."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from roms_tpu.core import lmd as lmd_mod
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


def _ddmix_inputs(dT, dS, aob, N=6, Mj=3, Li=4):
    """Two-tracer column with uniform interface jumps dT, dS and a
    prescribed alpha/beta ratio so Rrho = aob*dT/dS exactly."""
    cfg = upwelling.make_config(Lm=Li - 2, Mm=Mj - 2, N=N,
                                dtype="float64")
    T = 15.0 + dT * jnp.arange(N, dtype=jnp.float64)[:, None, None] \
        * jnp.ones((N, Mj, Li))
    S = 35.0 + dS * jnp.arange(N, dtype=jnp.float64)[:, None, None] \
        * jnp.ones((N, Mj, Li))
    t = jnp.stack([T, S])
    Akt = jnp.zeros((cfg.NAT, N + 1, Mj, Li))
    alfaobeta = aob * jnp.ones((N - 1, Mj, Li))
    return cfg, t, alfaobeta, Akt


class TestDDMix:
    def test_salt_fingering(self):
        """Warm salty over cool fresh, 1 < Rrho < Rrho0: both
        diffusivities rise, temperature gets the 0.7 fraction
        (lmd_vmix.F:380-393)."""
        cfg, t, aob, Akt0 = _ddmix_inputs(dT=1.0, dS=1.0, aob=1.5)
        Akt = lmd_mod.lmd_ddmix(cfg, t, aob, Akt0)
        dT_inc = np.asarray(Akt[0] - Akt0[0])
        dS_inc = np.asarray(Akt[1] - Akt0[1])
        # interior interfaces only; surface/bottom untouched
        assert dT_inc[0].max() == 0.0 and dT_inc[-1].max() == 0.0
        assert (dS_inc[1:-1] > 0.0).all()
        np.testing.assert_allclose(dT_inc[1:-1],
                                   lmd_mod.LMD_FDD * dS_inc[1:-1],
                                   rtol=1e-14)
        # Rrho=1.5, Rrho0=1.9: nu_dds = nuf*(1-((R-1)/(R0-1))^2)^3
        expect = lmd_mod.LMD_NUF * (1.0 - (0.5 / 0.9) ** 2) ** 3
        np.testing.assert_allclose(dS_inc[1:-1], expect, rtol=1e-12)

    def test_diffusive_convection(self):
        """Cool fresh over warm salty (dT<0, dS<0, 0<Rrho<1):
        Marmorino & Caldwell temperature diffusivity dominates
        (lmd_vmix.F:397-415)."""
        cfg, t, aob, Akt0 = _ddmix_inputs(dT=-1.0, dS=-1.0, aob=0.7)
        Akt = lmd_mod.lmd_ddmix(cfg, t, aob, Akt0)
        dT_inc = np.asarray(Akt[0] - Akt0[0])[1:-1]
        dS_inc = np.asarray(Akt[1] - Akt0[1])[1:-1]
        assert (dT_inc > 0.0).all()
        # Rrho=0.7 >= 0.5 branch: nu_dds = nu_ddt*(1.85*R - 0.85)
        np.testing.assert_allclose(
            dS_inc, dT_inc * (lmd_mod.LMD_SDD2 * 0.7 - lmd_mod.LMD_SDD3),
            rtol=1e-12)
        exact = lmd_mod.LMD_NU * lmd_mod.LMD_TDD1 * np.exp(
            lmd_mod.LMD_TDD2 * np.exp(
                -lmd_mod.LMD_TDD3 * (1.0 / 0.7 - 1.0)))
        np.testing.assert_allclose(dT_inc, exact, rtol=1e-12)

    def test_stable_stratification_inert(self):
        """Warm fresh over cool salty (Rrho < 0): no double diffusion."""
        cfg, t, aob, Akt0 = _ddmix_inputs(dT=1.0, dS=-1.0, aob=1.5)
        Akt = lmd_mod.lmd_ddmix(cfg, t, aob, Akt0)
        np.testing.assert_array_equal(np.asarray(Akt), np.asarray(Akt0))

    def test_full_step_integration(self):
        """ddmix=True routes through the whole-array KPP path and the
        coupled step stays finite."""
        cfg = upwelling.make_config(Lm=10, Mm=8, N=8, dtype="float64")
        cfg = cfg.replace(mixing=dataclasses.replace(
            cfg.mixing, vmix="lmd", ddmix=True))
        grid = upwelling.make_grid(cfg)
        state = upwelling.make_initial(cfg, grid)
        model = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid))
        s = model.run(state, 3)
        assert np.isfinite(np.asarray(s.t)).all()
        assert np.isfinite(np.asarray(s.u)).all()


class TestBodyForce:
    def test_vertical_integral_preserved(self):
        """BODYFORCE deposits the same depth-integrated momentum as the
        surface-flux path (rhs3d.F body-force comment): ubar and the
        3-D column integral agree, the vertical profile does not."""
        cfg0 = upwelling.make_config(Lm=10, Mm=8, N=8, dtype="float64")
        cfgb = cfg0.replace(bodyforce=True, levsfrc=1)
        outs = []
        for cfg in (cfg0, cfgb):
            grid = upwelling.make_grid(cfg)
            state = upwelling.make_initial(cfg, grid)
            model = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid))
            # 2 steps: the upwelling wind ramp is zero at t=0, so the
            # first step is stress-free; the second applies stress from
            # identical time-n states, isolating the deposition path.
            outs.append((model.run(state, 2), grid))
        (s0, g0), (sb, _) = outs
        np.testing.assert_allclose(np.asarray(sb.vbar),
                                   np.asarray(s0.vbar),
                                   rtol=0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(sb.ubar),
                                   np.asarray(s0.ubar),
                                   rtol=0, atol=1e-10)
        # profile redistribution is real: surface momentum differs
        dv = np.abs(np.asarray(sb.v) - np.asarray(s0.v))
        du = np.abs(np.asarray(sb.u) - np.asarray(s0.u))
        assert max(dv.max(), du.max()) > 1e-9

    def test_levsfrc_limits_deposition(self):
        """levsfrc = N confines the body force to the top layer,
        reproducing the surface-flux seed exactly."""
        cfg0 = upwelling.make_config(Lm=10, Mm=8, N=8, dtype="float64")
        cfgb = cfg0.replace(bodyforce=True, levsfrc=cfg0.N)
        outs = []
        for cfg in (cfg0, cfgb):
            grid = upwelling.make_grid(cfg)
            state = upwelling.make_initial(cfg, grid)
            model = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid))
            outs.append(model.run(state, 2))
        s0, sb = outs
        np.testing.assert_allclose(np.asarray(sb.v), np.asarray(s0.v),
                                   rtol=0, atol=1e-13)
        np.testing.assert_allclose(np.asarray(sb.u), np.asarray(s0.u),
                                   rtol=0, atol=1e-13)
