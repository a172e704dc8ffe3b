"""The Pallas layer must vanish under differentiation: pallas_call has
no reverse-mode rule, so the DA/TLM/ADM codepaths trace the jnp model
inside ops.kernel_gate.no_pallas() even where kernels are forced on."""

import numpy as np

from roms_tpu.functionals import benchmark
from roms_tpu.ops import (kernel_gate, pallas_flux, pallas_prsgrd,
                          pallas_tadv)


def test_gate_disables_every_kernel(monkeypatch):
    cfg = benchmark.make_config(Lm=16, Mm=10, N=4)
    for name in ("PRSGRD", "FLUX", "TADV"):
        monkeypatch.setenv(f"ROMS_TPU_PALLAS_{name}", "1")
    assert pallas_prsgrd.use_pallas_prsgrd(cfg)
    assert pallas_flux.use_pallas_flux(cfg)
    assert pallas_tadv.use_pallas_tadv(cfg)
    with kernel_gate.no_pallas():
        assert not pallas_prsgrd.use_pallas_prsgrd(cfg)
        assert not pallas_flux.use_pallas_flux(cfg)
        assert not pallas_tadv.use_pallas_tadv(cfg)
    assert pallas_prsgrd.use_pallas_prsgrd(cfg)


def test_grad_through_step_with_kernels_forced(monkeypatch):
    """jax.grad of the step succeeds when the AD region disables the
    kernels, even with every kernel env-forced on (the TPU default)."""
    import jax

    from roms_tpu.core import stepping
    for name in ("PRSGRD", "FLUX", "TADV", "UV", "RHS3D", "UVMIX",
                 "VDIFF"):
        monkeypatch.setenv(f"ROMS_TPU_PALLAS_{name}", "1")
        monkeypatch.setenv(f"ROMS_TPU_PALLAS_{name}_INTERPRET", "1")
    cfg = benchmark.make_config(Lm=12, Mm=10, N=4, dtype="float64")
    grid = benchmark.make_grid(cfg)
    s = benchmark.make_initial(cfg, grid)
    m = stepping.Model(cfg, grid,
                       forcing_fn=benchmark.make_forcing_fn(cfg, grid))

    def loss(zeta):
        return m.step_impl(s._replace(zeta=zeta), grid).zeta.sum()

    with kernel_gate.no_pallas():
        g = jax.grad(loss)(s.zeta)
    assert np.isfinite(np.asarray(g)).all()
