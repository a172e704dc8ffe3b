"""CHANNEL_NECK — channel with a constriction (channel_neck.h).

The last of the 35 reference application headers: DJ_GRADPS,
UV_VIS2 + MIX_GEO_UV, linear drag, MASKING, analytic vertical mixing
(ana_vmix.h:116-122,240-247), constant westward wind
(ana_smflux.h:175-186).  It is the reference's CORRELATION-driver
sanity app, so the correlation map over the masked grid is smoked
here too.
"""

import numpy as np
import pytest

from roms_tpu.core.stepping import Model
from roms_tpu.functionals import idealized as ia

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def spun_up():
    cfg = ia.channel_neck_config(Lm=64, Mm=24, N=10)
    grid = ia.channel_neck_grid(cfg)
    s0 = ia.channel_neck_initial(cfg, grid)
    m = Model(cfg, grid, ia.channel_neck_forcing_fn(cfg, grid),
              vmix_fn=ia.channel_neck_vmix(cfg))
    s = m.run(s0, 200)
    return cfg, grid, s0, s


def test_neck_geometry(spun_up):
    cfg, grid, _, _ = spun_up
    rmask = np.asarray(grid.rmask)
    Mj, Li = cfg.shape2d
    # open everywhere at the ends, pinched to ~40% at mid-channel
    assert rmask[1:-1, 2].all() and rmask[1:-1, Li - 3].all()
    mid_open = rmask[:, Li // 2].sum()
    assert 0.25 * Mj < mid_open < 0.55 * Mj, mid_open


def test_westward_jet_through_neck(spun_up):
    cfg, grid, s0, s = spun_up
    u = np.asarray(s.u)
    umask = np.asarray(grid.umask)
    assert np.isfinite(u).all()
    # westward wind drives westward surface flow; continuity
    # accelerates it through the constriction
    Li = cfg.shape2d[1]
    surf = u[-1] * umask
    mean_neck = surf[:, Li // 2 - 1].sum() / max(
        umask[:, Li // 2 - 1].sum(), 1.0)
    mean_wide = surf[:, 4].sum() / max(umask[:, 4].sum(), 1.0)
    assert mean_neck < 0.0, mean_neck
    assert mean_neck < mean_wide, (mean_neck, mean_wide)
    # velocity stays zero on land
    assert np.abs(u * (1.0 - umask)).max() == 0.0


def test_ana_vmix_profile(spun_up):
    """ana_vmix.h:240-247 check values at the surface interface."""
    cfg, grid, _, s = spun_up
    vmix = ia.channel_neck_vmix(cfg)
    from roms_tpu.grid.depth import set_depth
    import jax.numpy as jnp
    _, z_w, _ = set_depth(grid, jnp.zeros(cfg.shape2d, cfg.dtype))
    Akv, Akt = vmix(s, grid, z_w)
    assert np.allclose(np.asarray(Akv[-1]), 1.0e-3)      # 2e-4+8e-4
    assert np.allclose(np.asarray(Akt[0][-1]), 1.0e-5)   # 2e-6+8e-6
    assert (np.asarray(Akv[0]) < 3.0e-4).all()           # decayed


def test_correlation_map_respects_mask(spun_up):
    """correlation.h driver on its own app: the B-correlation around
    a point just upstream of the neck peaks at 1, decays, and leaves
    land untouched."""
    from roms_tpu.assim.controls import Control
    from roms_tpu.assim.i4dvar import _zeros_control, make_bsqrt
    from roms_tpu.assim.symmetry import correlation_map
    cfg, grid, s0, _ = spun_up
    tmpl = _zeros_control(s0)
    bsqrt = make_bsqrt(Control(zeta=1.0, u=1.0, v=1.0, t=1.0),
                       smooth=2, rmask=np.asarray(grid.rmask))
    Mj, Li = cfg.shape2d
    cm = np.asarray(correlation_map(bsqrt, tmpl, "t",
                                    j=Mj // 2, i=Li // 3, k=-1))
    if cm.ndim == 4:
        cm = cm[0]
    surf = cm[-1]
    assert abs(surf[Mj // 2, Li // 3] - 1.0) < 1e-6
    assert np.isfinite(surf).all()
    far = np.abs(surf[Mj // 2, (Li // 3 + Li // 2) % Li])
    assert far < 0.2, far


def test_channel_neck_deck_end_to_end(tmp_path):
    """Deck-driven run (roms_channel_neck1.in analog): MyAppCPP
    selects the native factory (grid, initial, wind, ana vmix)."""
    from roms_tpu.__main__ import main
    deck = str(tmp_path / "roms_channel_neck1.in")
    with open(deck, "w") as fh:
        fh.write("""
TITLE = Channel with a Constriction Test
MyAppCPP == CHANNEL_NECK
Lm == 64
Mm == 24
N == 8
NTIMES == 4
DT == 120.0d0
NDTFAST == 24
NRREC == 0
NHIS == 0
NRST == 0
NINFO == 0
""")
    rc = main([deck, "--outdir", str(tmp_path), "--dtype", "float64"])
    assert rc == 0
