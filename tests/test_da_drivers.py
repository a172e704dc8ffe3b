"""The DA/GST driver tail (VERDICT round-3 item 9): the symmetry.h
H R R' H' operator check, the correlation.h background-correlation
driver, and the so_semi seminorm stochastic optimals."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.assim.i4dvar import Control, Observations
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


@pytest.fixture(scope="module")
def small_model():
    cfg = upwelling.make_config(Lm=8, Mm=8, N=4, dtype="float64")
    grid = upwelling.make_grid(cfg)
    model = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  upwelling.make_vmix_fn(cfg))
    x0 = model.run(upwelling.make_initial(cfg, grid), 2)
    return cfg, grid, model, x0


def _obs(cfg, n=6):
    rng = np.random.RandomState(3)
    jj = rng.randint(2, cfg.shape2d[0] - 2, n)
    ii = rng.randint(2, cfg.shape2d[1] - 2, n)
    kk = np.full(n, cfg.N - 1)
    idx = jnp.asarray(np.stack([kk, jj, ii], axis=1))
    return Observations(step=2, field="temp", indices=idx,
                        values=jnp.zeros(n), error=0.1)


def test_symmetry_driver_roundoff(small_model):
    """Drivers/symmetry.h:9-16: the materialized G B G^T must be
    symmetric to roundoff — the acceptance gate for the TLM/ADM pair
    and the self-adjointness of B^(1/2)."""
    from roms_tpu.assim.symmetry import symmetry_check
    cfg, grid, model, x0 = small_model
    obs = _obs(cfg)
    sig = Control(zeta=0.01, u=0.01, v=0.01, t=0.3)
    P, asym = symmetry_check(model, grid, x0, obs, nsteps=2,
                             sigmas=sig)
    assert P.shape == (6, 6)
    assert np.abs(P).max() > 0.0          # operator is not trivially 0
    assert asym < 1e-10, asym


def test_correlation_driver_structure(small_model):
    """Drivers/correlation.h: B applied to a unit impulse yields a
    positive, localized, peak-normalized correlation map."""
    from roms_tpu.assim.i4dvar import _zeros_control, make_bsqrt
    from roms_tpu.assim.symmetry import correlation_map
    cfg, grid, model, x0 = small_model
    tmpl = _zeros_control(x0)
    bsqrt = make_bsqrt(Control(zeta=1.0, u=1.0, v=1.0, t=1.0),
                       smooth=2)
    cm = correlation_map(bsqrt, tmpl, "t", j=4, i=4, k=-1)
    cm = np.asarray(cm)
    if cm.ndim == 4:
        cm = cm[0]
    surf = cm[-1]
    # peak of 1 at the impulse point, decaying outward
    assert abs(surf[4, 4] - 1.0) < 1e-6
    assert surf[4, 6] < surf[4, 5] < surf[4, 4]
    assert surf[4, 5] > 0.05              # finite correlation scale
    # far field ~ 0
    assert abs(surf[1, 1]) < 0.2


class TestSoSemi:
    def _traj_fns(self, small_model, times):
        cfg, grid, model, x0 = small_model

        def make(nsteps):
            def traj(dx):
                def run(p):
                    s = x0._replace(
                        zeta=x0.zeta + p.zeta, u=x0.u + p.u,
                        v=x0.v + p.v, t=x0.t + p.t)
                    for _ in range(nsteps):
                        s = model.step_impl(s, grid)
                    return Control(zeta=s.zeta, u=s.u, v=s.v, t=s.t)
                zero = Control(jnp.zeros_like(x0.zeta),
                               jnp.zeros_like(x0.u),
                               jnp.zeros_like(x0.v),
                               jnp.zeros_like(x0.t))
                from roms_tpu.core.gst import _ad_jvp
                _, out = _ad_jvp(run, (zero,), (dx,))
                return out
            return traj

        return [make(n) for n in times]

    def test_so_semi_eigenpairs(self, small_model):
        """so_semi: the seminorm-restricted SO operator is PSD and its
        Lanczos eigenpairs satisfy S v = lambda v."""
        from roms_tpu.core.gst import (_flat, _unflat, so_semi,
                                       make_propagators)
        cfg, grid, model, x0 = small_model
        zero = Control(jnp.zeros_like(x0.zeta), jnp.zeros_like(x0.u),
                       jnp.zeros_like(x0.v), jnp.zeros_like(x0.t))
        # seminorm: surface temperature in a box (the reference's
        # Lstate/KstrS:KendS window)
        mask_t = jnp.zeros_like(x0.t).at[0, -1, 3:6, 3:6].set(1.0)
        semi = Control(jnp.zeros_like(x0.zeta), jnp.zeros_like(x0.u),
                       jnp.zeros_like(x0.v), mask_t)
        fns = self._traj_fns(small_model, [1, 2])
        evals, vecs = so_semi(fns, zero, semi, nvec=2, niter=8)
        assert (np.asarray(evals) >= -1e-12).all()
        assert evals[0] > 0.0
        # operator correctness: S must be symmetric (<v,Sw>=<Sv,w>)
        # and PSD on random probes — exact properties of
        # sum_t M_t^T G M_t with a correct TLM/ADM pair
        ops = [make_propagators(fn, zero) for fn in fns]
        g = _flat(semi)

        def S(x):
            return sum(MT(g * (g * M(x))) for M, MT in ops)

        rng = np.random.RandomState(0)
        n = g.size
        va = jnp.asarray(rng.randn(n))
        wa = jnp.asarray(rng.randn(n))
        Sv, Sw = S(va), S(wa)
        lhs = float(jnp.vdot(wa, Sv))
        rhs = float(jnp.vdot(Sw, va))
        assert abs(lhs - rhs) < 1e-9 * max(abs(lhs), 1e-30)
        assert float(jnp.vdot(va, Sv)) >= 0.0
        # Ritz residual of the leading pair (8 Lanczos iterations:
        # approximate, not tight)
        v = _flat(vecs[0])
        res = float(jnp.linalg.norm(S(v) - evals[0] * v)
                    / (abs(evals[0]) * jnp.linalg.norm(v) + 1e-30))
        assert res < 0.05, res

    def test_red_noise_decay_changes_spectrum(self, small_model):
        """SO_decay (red noise): temporal correlation couples the
        snapshots, raising the leading eigenvalue above the white-noise
        operator's."""
        from roms_tpu.core.gst import so_semi
        cfg, grid, model, x0 = small_model
        zero = Control(jnp.zeros_like(x0.zeta), jnp.zeros_like(x0.u),
                       jnp.zeros_like(x0.v), jnp.zeros_like(x0.t))
        mask_t = jnp.zeros_like(x0.t).at[0, -1].set(1.0)
        semi = Control(jnp.zeros_like(x0.zeta), jnp.zeros_like(x0.u),
                       jnp.zeros_like(x0.v), mask_t)
        fns = self._traj_fns(small_model, [1, 2])
        ew, _ = so_semi(fns, zero, semi, nvec=1, niter=8)
        er, _ = so_semi(fns, zero, semi, nvec=1, niter=8,
                        times=[0.0, cfg.dt], decay=10.0 * cfg.dt)
        assert er[0] > ew[0]
