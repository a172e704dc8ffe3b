"""Foundation tests: stretching, weights, depths, grid, tridiag, EOS."""

import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.config import ModelConfig, VerticalCoordConfig
from roms_tpu.core.weights import power_law_weights
from roms_tpu.grid import scoord
from roms_tpu.grid.depth import set_depth, set_massflux
from roms_tpu.ops.tridiag import tridiag_solve, implicit_vdiff_solve
from roms_tpu.functionals import upwelling


class TestScoord:
    @pytest.mark.parametrize("V", [1, 2, 3, 4, 5])
    def test_endpoints_and_monotonic(self, V):
        vc = VerticalCoordConfig(N=16, Vstretching=V, theta_s=3.0,
                                 theta_b=0.5 if V != 3 else 0.8)
        sc_r, Cs_r, sc_w, Cs_w = scoord.stretching(vc)
        assert sc_w[0] == -1.0 and sc_w[-1] == 0.0
        # V=1 derives Cs_w(N) from the formula (roundoff-zero), like the
        # reference (set_scoord.F:209-233); others force exact endpoints.
        assert Cs_w[0] == -1.0 and abs(Cs_w[-1]) < 1e-14
        assert np.all(np.diff(sc_w) > 0)
        assert np.all(np.diff(Cs_w) > 0)
        assert np.all(Cs_r > -1.0) and np.all(Cs_r < 0.0)
        # rho levels interleave w interfaces
        assert np.all(sc_r > sc_w[:-1]) and np.all(sc_r < sc_w[1:])

    def test_upwelling_values(self):
        # Vstretching=4, theta_s=3, theta_b=0: C(s) = (1-cosh(3s))/(cosh(3)-1)
        vc = VerticalCoordConfig(N=16, Vstretching=4, theta_s=3.0,
                                 theta_b=0.0)
        _, Cs_r, _, Cs_w = scoord.stretching(vc)
        s = -0.5
        expected = (1.0 - np.cosh(3.0 * s)) / (np.cosh(3.0) - 1.0)
        assert np.isclose(Cs_w[8], expected, rtol=1e-14)


class TestWeights:
    @pytest.mark.parametrize("nd", [20, 30, 60])
    def test_moments(self, nd):
        nfast, w1, w2 = power_law_weights(nd)
        # nfast in the documented range ~1.4-1.7x ndtfast (SURVEY.md)
        assert nd < nfast <= 2 * nd
        assert np.isclose(w1[:nfast].sum(), 1.0, atol=1e-14)
        assert np.isclose(w2[:nfast].sum(), 1.0, atol=1e-14)
        # first moment of primary weights lands exactly on ndtfast
        centroid = (w1 * np.arange(1, 2 * nd + 1)).sum() / nd
        assert np.isclose(centroid, 1.0, atol=1e-9)
        # second moment close to 1 (set_weights.F:221 requires > 1.0001 fail)
        m2 = (w1 * np.arange(1, 2 * nd + 1) ** 2).sum() / nd ** 2
        assert m2 > 1.0
        # secondary centroid ~ 1/2 (set_weights report)
        sh = (w2 * (np.arange(1, 2 * nd + 1) - 0.5)).sum() / nd
        assert abs(sh - 0.5) < 0.05
        # Leading weights may be slightly negative (the -gamma*xi term of
        # the power-law shape; set_weights.F:82-87 keeps them) but the bulk
        # must be positive and bounded.
        assert w1.min() > -0.01 and w1.max() < 0.2


class TestDepth:
    def test_set_depth_consistency(self):
        cfg = upwelling.make_config(dtype="float64")
        grid = upwelling.make_grid(cfg)
        zeta = 0.3 * jnp.cos(jnp.linspace(0, 3, cfg.shape2d[0]))[:, None] \
            * jnp.ones(cfg.shape2d)
        z_r, z_w, Hz = set_depth(grid, zeta)
        assert np.allclose(z_w[0], -np.asarray(grid.h))
        assert np.allclose(z_w[-1], np.asarray(zeta), atol=1e-12)
        assert np.allclose(Hz.sum(0), np.asarray(grid.h + zeta), atol=1e-10)
        assert np.all(np.asarray(Hz) > 0)
        # rho levels between interfaces
        assert np.all(np.asarray(z_r) > np.asarray(z_w[:-1]))
        assert np.all(np.asarray(z_r) < np.asarray(z_w[1:]))

    def test_massflux_units(self):
        cfg = upwelling.make_config(dtype="float64")
        grid = upwelling.make_grid(cfg)
        zeta = jnp.zeros(cfg.shape2d)
        _, _, Hz = set_depth(grid, zeta)
        u = jnp.ones((cfg.N,) + cfg.shape2d)
        v = jnp.zeros_like(u)
        Huon, Hvom = set_massflux(grid, u, v, Hz)
        # Huon = Hz_u * u * dy; dy = 1000 m
        expect = np.asarray(0.5 * (Hz + jnp.roll(Hz, 1, -1)) * 1000.0)
        assert np.allclose(np.asarray(Huon)[:, :, 1:], expect[:, :, 1:])


class TestTridiag:
    def test_vs_dense(self):
        rng = np.random.default_rng(0)
        N, B = 16, 5
        a = rng.uniform(0.1, 0.5, (N, B))
        b = rng.uniform(2.0, 3.0, (N, B))
        c = rng.uniform(0.1, 0.5, (N, B))
        d = rng.normal(size=(N, B))
        x = np.asarray(tridiag_solve(jnp.array(a), jnp.array(b),
                                     jnp.array(c), jnp.array(d)))
        for col in range(B):
            M = np.zeros((N, N))
            for k in range(N):
                M[k, k] = b[k, col]
                if k > 0:
                    M[k, k - 1] = a[k, col]
                if k < N - 1:
                    M[k, k + 1] = c[k, col]
            ref = np.linalg.solve(M, d[:, col])
            assert np.allclose(x[:, col], ref, atol=1e-12)

    def test_implicit_vdiff_conserves(self):
        # Implicit vertical diffusion conserves the vertical integral.
        N = 16
        rng = np.random.default_rng(1)
        Hz = jnp.asarray(rng.uniform(5.0, 15.0, (N, 3, 4)))
        AK = jnp.asarray(rng.uniform(1e-4, 1e-2, (N + 1, 3, 4)))
        AK = AK.at[0].set(0.0).at[-1].set(0.0)
        z = jnp.cumsum(Hz, axis=0)
        dz_inv = 1.0 / (z[1:] - z[:-1])
        q = jnp.asarray(rng.normal(size=(N, 3, 4)))
        qHz = q * Hz
        sol = implicit_vdiff_solve(Hz, AK, dz_inv, qHz, dt=300.0)
        assert np.allclose(np.asarray((sol * Hz).sum(0)),
                           np.asarray(qHz.sum(0)), rtol=1e-12)


class TestEOS:
    def test_linear(self):
        from roms_tpu.core.rho_eos import rho_eos
        cfg = upwelling.make_config(dtype="float64")
        grid = upwelling.make_grid(cfg)
        st = upwelling.make_initial(cfg, grid)
        rho, pden, rhoA, rhoS, bvf = rho_eos(cfg, st.t, st.z_r, st.Hz,
                                             st.z_w)
        # rho = R0 - R0*Tcoef*(T-T0) - 1000
        expect = 1027.0 * (1.0 - 1.7e-4 * (np.asarray(st.t[0]) - 14.0)) - 1000.0
        assert np.allclose(np.asarray(rho), expect, atol=1e-10)
        # denser at depth
        assert np.all(np.asarray(rho[0] >= rho[-1]))

    def test_jm95_check_value(self):
        from roms_tpu.core.rho_eos import rho_eos_jm95
        cfg = upwelling.make_config(dtype="float64").replace(
            eos=upwelling.make_config().eos.__class__(linear=False))
        t = jnp.array([[[[3.0]]], [[[35.5]]]])
        z = jnp.array([[[-5000.0]]])
        rho = rho_eos_jm95(cfg, t, z)
        # rho_eos.F:29: den = 1050.3639165364 at (3C, 35.5 PSU, -5000m)
        assert np.isclose(float(rho[0, 0, 0]) + 1000.0, 1050.3639165364,
                          atol=1e-6)
