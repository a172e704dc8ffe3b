"""Suspended sediment + bed exchange tests (Sediment/sed_fluxes.F,
sed_settling.F)."""

import jax.numpy as jnp
import numpy as np

from roms_tpu.core.sediment import SedConfig, initial_sed, make_sed_hook
from roms_tpu.core.state import initial_state
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


def _setup(**sed_kw):
    cfg = upwelling.make_config(Lm=14, Mm=16, N=8,
                                dtype="float64").replace(NT=3)
    grid = upwelling.make_grid(cfg)
    st0 = upwelling.make_initial(cfg, grid)
    sedc = SedConfig(nsed=1, **sed_kw)
    mud = jnp.full_like(st0.t[0], 0.01)
    t3 = jnp.concatenate([st0.t, mud[None]], axis=0)
    st = initial_state(cfg, grid, zeta=st0.zeta, t=t3,
                       sed=initial_sed(cfg, sedc, bed_mass0=1.0))
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              upwelling.make_vmix_fn(cfg),
              sed_fn=make_sed_hook(cfg, sedc, grid))
    return cfg, grid, st, m


def _totals(s):
    susp = np.asarray(s.t[2] * s.Hz)[:, 1:-1, 1:-1].sum(0)
    bed = np.asarray(s.sed.bed_mass[0])[1:-1, 1:-1]
    return susp, bed


class TestSediment:
    def test_total_mass_conserved(self):
        cfg, grid, st, m = _setup(Wsed=(1.0,), Erate=(5e-4,),
                                  tau_ce=(2e-5,))
        s = m.run(st, 40)
        susp0, bed0 = _totals(st)
        susp1, bed1 = _totals(s)
        tot0 = susp0.mean() + bed0.mean()
        tot1 = susp1.mean() + bed1.mean()
        assert abs(tot1 - tot0) < 1e-10 * tot0
        assert np.asarray(s.t[2]).min() > -1e-12
        assert np.asarray(s.sed.bed_mass).min() >= 0.0

    def test_settling_deposits_in_quiet_water(self):
        """High tau_ce (no erosion): settling empties the water column
        into the bed."""
        cfg, grid, st, m = _setup(Wsed=(10.0,), Erate=(0.0,),
                                  tau_ce=(10.0,))
        s = m.run(st, 60)
        susp0, bed0 = _totals(st)
        susp1, bed1 = _totals(s)
        assert susp1.mean() < 0.2 * susp0.mean()
        assert bed1.mean() > bed0.mean()


class TestBedload:
    def test_mpm_transport_and_conservation(self):
        """MPM bedload (sed_bedload.F): no transport below critical
        Shields stress; above it, mass moves downstream while total
        bed mass is conserved in a periodic domain."""
        import jax.numpy as jnp
        import numpy as np
        from roms_tpu.core import sediment as sed_mod
        from roms_tpu.functionals import upwelling

        cfg = upwelling.make_config(dtype="float64")
        grid = upwelling.make_grid(cfg)
        sed = sed_mod.SedConfig()
        Mj, Li = cfg.shape2d
        bed = jnp.ones((1, Mj, Li)) * 5.0
        # weak stress: below threshold -> nothing moves
        bu = jnp.full((Mj, Li), 1.0e-6)
        bv = jnp.zeros((Mj, Li))
        nb, bu_f, bv_f = sed_mod.bedload_mpm(cfg, sed, grid, bed, bu,
                                             bv)
        assert float(jnp.abs(nb - bed).max()) == 0.0
        # strong localized stress bump: transport converges/diverges
        # around it, all fluxes vanishing near the boundary ring
        x = jnp.arange(Li)[None, :]
        bu = 2.0e-3 * jnp.exp(-((x - Li / 2.0) / 6.0) ** 2) * \
            jnp.ones((Mj, 1))
        nb, bu_f, bv_f = sed_mod.bedload_mpm(cfg, sed, grid, bed, bu,
                                             bv)
        nbn = np.asarray(nb)
        assert np.isfinite(nbn).all()
        assert np.abs(nbn - 5.0).max() > 0.0        # bed changed
        # interior mass conservation: flux-form divergence
        omn = 1.0 / np.asarray(grid.pm * grid.pn)
        dm = ((nbn[0] - 5.0) * omn)[1:-1, 1:-1].sum()
        tot = (np.abs(nbn[0] - 5.0) * omn)[1:-1, 1:-1].sum()
        assert abs(dm) < 0.2 * tot + 1e-12


def test_soulsby_wave_bedload():
    """BEDLOAD_SOULSBY (sed_bedload.F:425-484): below critical Shields
    nothing moves; waves at an angle to the current drive transverse
    transport (phi_y) in addition to streamwise (phi_x)."""
    import jax.numpy as jnp
    import numpy as np
    from roms_tpu.core import sediment as sed_mod
    from roms_tpu.functionals import upwelling

    cfg = upwelling.make_config(dtype="float64")
    grid = upwelling.make_grid(cfg)
    sed = sed_mod.SedConfig()
    Mj, Li = cfg.shape2d
    bed = jnp.ones((1, Mj, Li)) * 5.0
    zero = jnp.zeros((Mj, Li))
    # sub-critical: theta ~ 0.01 -> no transport
    smgd = (2650.0 / cfg.rho0 - 1.0) * cfg.g * 2.0e-4
    nb, bu, bv = sed_mod.bedload_soulsby(
        cfg, sed, grid, bed, zero + 0.01 * smgd, zero, zero, zero)
    assert float(jnp.abs(nb - bed).max()) == 0.0
    # super-critical mean stress + waves at 45 degrees: both components
    nb, bu, bv = sed_mod.bedload_soulsby(
        cfg, sed, grid, bed, zero + 0.2 * smgd, zero + 0.3 * smgd,
        zero, zero + jnp.pi / 4.0)
    assert np.isfinite(np.asarray(nb)).all()
    assert float(jnp.abs(np.asarray(bu)).max()) > 0.0
    assert float(jnp.abs(np.asarray(bv)).max()) > 0.0
