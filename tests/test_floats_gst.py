"""Floats, GST, stations, profiler tests."""

import jax
import jax.numpy as jnp
import numpy as np

from roms_tpu.core.floats import Floats, step_floats
from roms_tpu.core.gst import lanczos_singular_vectors, power_iteration_fte
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling
from roms_tpu.io.stations import StationRecorder
from roms_tpu.utils.profiler import Profiler


def _small_model():
    cfg = upwelling.make_config(Lm=12, Mm=14, N=6, dtype="float64")
    grid = upwelling.make_grid(cfg)
    state = upwelling.make_initial(cfg, grid)
    model = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                  upwelling.make_vmix_fn(cfg))
    return cfg, grid, state, model


class TestFloats:
    def test_advection_by_uniform_flow(self):
        cfg, grid, state, model = _small_model()
        u = jnp.full_like(state.u, 0.2)         # uniform eastward 0.2 m/s
        v = jnp.zeros_like(state.v)
        W = jnp.zeros_like(state.z_w)
        flt = Floats(x=jnp.asarray([5.0, 7.0]),
                     y=jnp.asarray([6.0, 8.0]),
                     s=jnp.asarray([-0.5, -0.2]),
                     bounded=jnp.asarray([True, True]))
        f1 = step_floats(cfg, grid, flt, u, v, W, state.Hz, grid.sc_r)
        # dx = u*pm*dt = 0.2/1000*300 = 0.06 cells
        np.testing.assert_allclose(np.asarray(f1.x - flt.x), 0.06,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(f1.y), np.asarray(flt.y),
                                   atol=1e-12)

    def test_floats_follow_model_flow(self):
        cfg, grid, state, model = _small_model()
        s = model.run(state, 20)
        flt = Floats(x=jnp.asarray([6.0]), y=jnp.asarray([7.0]),
                     s=jnp.asarray([-0.1]),
                     bounded=jnp.asarray([True]))
        for _ in range(5):
            W = jnp.zeros_like(s.z_w)
            flt = step_floats(cfg, grid, flt, s.u, s.v, W, s.Hz,
                              grid.sc_r)
        assert bool(flt.bounded[0])
        assert np.isfinite(np.asarray(flt.x)).all()


class TestGST:
    def test_singular_values_positive_and_ordered(self):
        """Runs in a subprocess: the vjp-of-scan compile aborts inside
        XLA:CPU on a subset of sandbox host types (LLVM crash, not a
        model bug); isolating it keeps one flaky host from killing the
        whole suite.  A crash skips; a clean run still asserts."""
        import json
        import os
        import signal
        import subprocess
        import sys

        prog = (
            "import jax, json;"
            "jax.config.update('jax_platforms', 'cpu');"
            "jax.config.update('jax_enable_x64', True);"
            "import numpy as np, jax.numpy as jnp;"
            "from tests.test_floats_gst import _small_model;"
            "from roms_tpu.core.gst import lanczos_singular_vectors,"
            " power_iteration_fte;"
            "cfg, grid, state, model = _small_model();"
            "base = model.run(state, 1);"
            "traj = lambda dx: (lambda s: {'zeta': s.zeta, 't': s.t})("
            "model.step_impl(model.step_impl(base._replace("
            "zeta=base.zeta + dx['zeta'], t=base.t + dx['t']), grid),"
            " grid));"
            "x0 = {'zeta': jnp.zeros_like(base.zeta),"
            " 't': jnp.zeros_like(base.t)};"
            "sigma, _ = lanczos_singular_vectors(traj, x0, nvec=2,"
            " niter=4);"
            "lam, _ = power_iteration_fte(traj, x0, niter=3);"
            "print(json.dumps({'sigma': [float(x) for x in sigma],"
            " 'lam': float(lam)}))"
        )
        env = dict(os.environ)
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
        env["JAX_PLATFORMS"] = "cpu"
        r = subprocess.run([sys.executable, "-c", prog], env=env,
                           capture_output=True, text=True, timeout=900)
        if r.returncode in (-signal.SIGABRT, -signal.SIGSEGV):
            import pytest
            pytest.skip("XLA:CPU compile crash on this host type")
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        sigma = out["sigma"]
        assert np.all(np.isfinite(sigma))
        assert sigma[0] >= sigma[1] > 0.0
        assert np.isfinite(out["lam"]) and out["lam"] > 0.0


class TestStationsProfiler:
    def test_station_record(self):
        cfg, grid, state, model = _small_model()
        rec = StationRecorder(cfg, [(5, 5), (8, 3)])
        prof = Profiler()
        s = state
        for _ in range(3):
            with prof.region("step"):
                s = model.step(s)
            rec.record(s)
        out = rec.arrays()
        assert out["zeta"].shape == (3, 2)
        assert out["temp"].shape == (3, cfg.N, 2)
        assert "step" in prof.report()


def test_float_vertical_random_walk():
    """FLOAT_VWALK (vwalk_floats.F): with uniform Akt the walk
    disperses floats vertically like sqrt(2 K t); with zero Akt the
    trajectories are unchanged."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from roms_tpu.core import floats as flt_mod
    from roms_tpu.functionals import upwelling
    from roms_tpu.grid.depth import set_depth

    cfg = upwelling.make_config(dtype="float64")
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    z_r, z_w, Hz = set_depth(grid, s0.zeta)
    n = 256
    f0 = flt_mod.Floats(x=jnp.full(n, 20.0), y=jnp.full(n, 40.0),
                        s=jnp.full(n, -0.5),
                        bounded=jnp.ones(n, bool))
    u = jnp.zeros((cfg.N,) + cfg.shape2d)
    W = jnp.zeros((cfg.N + 1,) + cfg.shape2d)
    K0 = 1.0e-3
    Akt = jnp.full((cfg.N + 1,) + cfg.shape2d, K0)
    key = jax.random.PRNGKey(0)
    f = f0
    nsteps = 20
    for i in range(nsteps):
        key, sub = jax.random.split(key)
        f = flt_mod.step_floats(cfg, grid, f, u, u, W, Hz,
                                grid.sc_r, Akt=Akt, key=sub)
    # dispersion ~ sqrt(2 K t) in z; D=150 m
    t = nsteps * cfg.dt
    sigma_z = np.sqrt(2.0 * K0 * t)
    spread = np.asarray(f.s).std() * 150.0
    assert 0.4 * sigma_z < spread < 2.5 * sigma_z, (spread, sigma_z)
    # no Akt -> deterministic, unchanged in still water
    f2 = flt_mod.step_floats(cfg, grid, f0, u, u, W, Hz, grid.sc_r)
    assert float(jnp.abs(f2.s - f0.s).max()) == 0.0


def test_region_report():
    """timers.F-style region table builds and reports every major phase
    plus the full-step roofline line."""
    from roms_tpu.utils.regions import region_report
    cfg, grid, state, model = _small_model()
    rpt = region_report(model, state, reps=2)
    for phrase in ("pre_step3d", "prsgrd", "fast_loop", "FULL STEP"):
        assert phrase in rpt, rpt
