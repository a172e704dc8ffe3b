"""MPDATA monotone tracer advection (step3d_t.F:873-1481 +
mpdata_adiff.F): positivity, no new extrema, and mass conservation on
the periodic UPWELLING channel."""

import numpy as np
import pytest

from roms_tpu.config import MPDATA
from roms_tpu.core.stepping import Model
from roms_tpu.functionals import upwelling


@pytest.fixture(scope="module")
def mpdata_run():
    cfg = upwelling.make_config(dtype="float64").replace(
        hadv=MPDATA, vadv=MPDATA)
    grid = upwelling.make_grid(cfg)
    s0 = upwelling.make_initial(cfg, grid)
    m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
              vmix_fn=upwelling.make_vmix_fn(cfg))
    s = m.run(s0, 40)
    return cfg, grid, s0, s


class TestMPDATA:
    def test_monotone_no_new_extrema(self, mpdata_run):
        """A monotone scheme must not create values outside the initial
        range (interior points; boundary rows are clamped rings)."""
        cfg, grid, s0, s = mpdata_run
        T0 = np.asarray(s0.t[0])
        T = np.asarray(s.t[0])[:, 1:-1, 1:-1]
        assert np.isfinite(T).all()
        # small tolerance for the non-advective physics (diffusion,
        # surface fluxes) that legitimately shift the extremes
        assert T.max() <= T0.max() + 1.0e-6
        assert T.min() >= T0.min() - 1.0e-6

    def test_overshoot_vs_centered(self):
        """The default centered4 scheme overshoots on a sharp front;
        MPDATA must not.  Advect a passive salinity blob."""
        def run(hadv, vadv):
            cfg = upwelling.make_config(dtype="float64").replace(
                hadv=hadv, vadv=vadv)
            grid = upwelling.make_grid(cfg)
            s0 = upwelling.make_initial(cfg, grid)
            # sharp positive blob in the salinity slot
            S = np.ones(np.asarray(s0.t[1]).shape)
            S[:, 6:10, 6:10] = 10.0
            t = np.asarray(s0.t).copy()
            t[1] = S
            s0 = s0._replace(t=np.asarray(t), t_prev=np.asarray(t))
            m = Model(cfg, grid, upwelling.make_forcing_fn(cfg, grid),
                      vmix_fn=upwelling.make_vmix_fn(cfg))
            s = m.run(s0, 40)
            return np.asarray(s.t[1])

        Sm = run(MPDATA, MPDATA)
        assert np.isfinite(Sm).all()
        # positivity to within the (non-monotone) biharmonic hmix term
        assert Sm.min() >= 1.0 - 1.0e-4, Sm.min()
        assert Sm.max() <= 10.0 + 1.0e-4, Sm.max()  # no overshoot

    def test_mass_conservation(self, mpdata_run):
        """Total Hz-weighted tracer content is invariant under pure
        advection + diffusion (periodic-x, closed walls, zero net
        surface flux in this setup)."""
        cfg, grid, s0, s = mpdata_run
        from roms_tpu.grid.depth import set_depth
        omn = 1.0 / np.asarray(grid.pm * grid.pn)

        def content(st):
            _, _, Hz = set_depth(grid, st.zeta)
            return float((np.asarray(Hz) * np.asarray(st.t[1]) *
                          omn[None]).sum())

        c0, c1 = content(s0), content(mpdata_run[3])
        assert abs(c1 - c0) / abs(c0) < 1.0e-9
