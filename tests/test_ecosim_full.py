"""Full-census EcoSim (ecosim_mod.h state / ecosim.h structure)."""

import numpy as np
import pytest

import jax.numpy as jnp

from roms_tpu.core.biology import (EcoSimFullConfig, ecosim_full,
                                   ecosim_full_layout, ecosim_full_nt)
from roms_tpu.functionals import upwelling
from roms_tpu.grid.depth import set_depth


@pytest.mark.quick
def test_census_matches_ecosim_mod():
    """61 biological tracers for the default 4-group census
    (ecosim_mod.h:201-283: 6 nutrients, 4 bacteria, 8 DOM, 10 fecal,
    18 phytoplankton incl. diatom Si, 15 pigments via the PIG
    matrix with PHY=(1,2,4,5))."""
    eco = EcoSimFullConfig()
    names = ecosim_full_layout(eco)
    assert len(names) == 61
    # groups 1-2 are diatoms: Si quota tracers present, 3-4 absent
    assert "PhyS1" in names and "PhyS2" in names
    assert "PhyS3" not in names and "PhyS4" not in names
    # PIG matrix: synechococcus (species 5 = group 4) carries
    # chl-a, PPC and HPUC only
    g4 = [n for n in names if n.startswith("Pig4")]
    assert g4 == ["Pig4_1", "Pig4_5", "Pig4_7"]
    # every name unique
    assert len(set(names)) == len(names)


def setup_column():
    eco = EcoSimFullConfig()
    nbio = len(ecosim_full_layout(eco))
    cfg = upwelling.make_config(Lm=4, Mm=4, N=8, dtype="float64")
    cfg = cfg.replace(NT=cfg.NAT + nbio)
    grid = upwelling.make_grid(cfg)
    Mj, Li = cfg.shape2d
    zeta = jnp.zeros((Mj, Li))
    z_r, z_w, Hz = set_depth(grid, zeta)
    t = jnp.zeros((cfg.NT, cfg.N, Mj, Li)) + 1.0e-4
    names = ecosim_full_layout(eco)
    idx = {n: cfg.NAT + i for i, n in enumerate(names)}
    t = t.at[0].set(20.0).at[1].set(35.0)
    seed = {"NO3": 5.0, "NH4": 0.5, "PO4": 0.3, "SiO": 4.0,
            "FeO": 0.05, "DIC": 2000.0, "BacC": 1.0, "BacN": 0.2,
            "BacP": 0.02, "BacF": 0.001, "DOMC1": 10.0, "DOMN1": 1.0,
            "DOMP1": 0.1, "CDMC1": 1.0}
    for g in range(4):
        seed[f"PhyC{g+1}"] = 5.0
        seed[f"PhyN{g+1}"] = 0.8
        seed[f"PhyP{g+1}"] = 0.05
        seed[f"PhyF{g+1}"] = 0.001
        seed[f"Pig{g+1}_1"] = 0.5
    seed["PhyS1"] = seed["PhyS2"] = 0.9
    for k, v in seed.items():
        t = t.at[idx[k]].set(v)
    srflx = jnp.full((Mj, Li), 300.0 / (cfg.rho0 * 3985.0))
    return eco, cfg, grid, t, Hz, z_w, srflx, idx


@pytest.mark.quick
def test_element_conservation():
    """C, N, P, Si and Fe inventories are closed (no sources/sinks
    other than redistribution; sinking stays in the column)."""
    eco, cfg, grid, t, Hz, z_w, srflx, idx = setup_column()

    def inventory(t):
        w = Hz[None]
        def tot(names):
            return float(sum((t[idx[n]] * Hz).sum() for n in names))
        C = tot(["DIC", "BacC", "CDMC1", "CDMC2", "DOMC1", "DOMC2",
                 "FecC1", "FecC2", "PhyC1", "PhyC2", "PhyC3", "PhyC4"])
        N = tot(["NO3", "NH4", "BacN", "DOMN1", "DOMN2", "FecN1",
                 "FecN2", "PhyN1", "PhyN2", "PhyN3", "PhyN4"])
        P = tot(["PO4", "BacP", "DOMP1", "DOMP2", "FecP1", "FecP2",
                 "PhyP1", "PhyP2", "PhyP3", "PhyP4"])
        Si = tot(["SiO", "FecS1", "FecS2", "PhyS1", "PhyS2"])
        Fe = tot(["FeO", "BacF", "FecF1", "FecF2", "PhyF1", "PhyF2",
                  "PhyF3", "PhyF4"])
        return np.array([C, N, P, Si, Fe])

    inv0 = inventory(t)
    cur = t
    for _ in range(5):
        cur = cur + ecosim_full(cfg, eco, grid, cur, Hz, z_w, srflx,
                                temp=cur[0])
    inv1 = inventory(cur)
    rel = np.abs(inv1 - inv0) / np.abs(inv0)
    assert (rel < 1e-10).all(), (inv0, inv1, rel)


@pytest.mark.quick
def test_growth_light_and_spectra():
    """Phytoplankton grow in the lit surface; light (hence growth)
    decays with depth; nutrients are consumed."""
    eco, cfg, grid, t, Hz, z_w, srflx, idx = setup_column()
    cur = t
    for _ in range(10):
        cur = cur + ecosim_full(cfg, eco, grid, cur, Hz, z_w, srflx,
                                temp=cur[0])
    dPhy = np.asarray(cur[idx["PhyC1"]] - t[idx["PhyC1"]])
    assert dPhy[-1, 2, 2] > 0.0                 # surface growth
    assert dPhy[-1, 2, 2] > dPhy[0, 2, 2]       # more than at depth
    assert float(cur[idx["NO3"]].sum()) < float(t[idx["NO3"]].sum())
    assert float(cur[idx["DIC"]].sum()) < float(t[idx["DIC"]].sum())
    # all fields finite and non-negative
    arr = np.asarray(cur[cfg.NAT:])
    assert np.isfinite(arr).all()
    assert arr.min() > -1e-12
