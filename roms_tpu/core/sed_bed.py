"""Multi-layer sediment bed stratigraphy.

Re-implements ROMS/Nonlinear/Sediment/sed_bed.F (+ sedbed_mod.h state):
an Nbed-layer bed with per-layer mass per sediment class, thickness,
porosity and age.  Per step:

  1. suspended-sediment exchange updates the top layer
     (sed_bed.F:258-296);
  2. fresh deposition onto an old surface creates a new top layer —
     bottom two layers merge, the stack pushes down, the deposit
     becomes the new surface layer (sed_bed.F:300-345);
  3. layer thickness/fractions are rebuilt from the masses
     (sed_bed.F:347-362);
  4. the active layer (Harris & Wiberg:
     za = max(0, 0.007*(tau_w - tau_ce)*rho0) + 6*D50) entrains mass
     from deeper layers when thicker than the surface layer; the
     partially-consumed layer keeps its remainder, consumed layers are
     repacked upward and the bottom layer splits to restore Nbed
     (sed_bed.F:370-477).

The per-column data-dependent layer index Ksed of the reference's
scalar loops becomes an unrolled where-select over the (small, static)
Nbed — whole-array, no gathers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import ModelConfig
from .sediment import SedConfig

_EPS = 1.0e-14


class BedState(NamedTuple):
    """sedbed_mod.h bed arrays, layer index leading (0 = surface)."""
    mass: jnp.ndarray     # (Nbed, nsed, Mj, Li) kg/m2
    thick: jnp.ndarray    # (Nbed, Mj, Li) m
    poro: jnp.ndarray     # (Nbed, Mj, Li)
    age: jnp.ndarray      # (Nbed, Mj, Li) s


def initial_bed(cfg: ModelConfig, sed: SedConfig, nbed: int = 4,
                mass0: float = 1.0, poro0: float = 0.5) -> BedState:
    shp = cfg.shape2d
    mass = jnp.full((nbed, sed.nsed) + shp, mass0, cfg.dtype)
    poro = jnp.full((nbed,) + shp, poro0, cfg.dtype)
    age = jnp.zeros((nbed,) + shp, cfg.dtype)
    srho = jnp.asarray(sed.Srho, cfg.dtype)[None, :, None, None]
    thick = jnp.sum(mass / (srho * (1.0 - poro0)), axis=1)
    return BedState(mass=mass, thick=thick, poro=poro, age=age)


def _rebuild_thickness(sed: SedConfig, mass, poro):
    srho = jnp.asarray(sed.Srho, mass.dtype)[None, :, None, None]
    return jnp.maximum(
        jnp.sum(mass / (srho * (1.0 - poro[:, None])), axis=1), 0.0)


def sed_bed_update(cfg: ModelConfig, sed: SedConfig, bed: BedState,
                   ero_flux, settling_flux, tau_w, time,
                   newlayer_thick: float = 0.001) -> BedState:
    """One stratigraphy update (sed_bed.F:216-477).

    ero_flux/settling_flux: (nsed, Mj, Li) kg/m2 per step (erosion out
    of / deposition into the bed); tau_w: kinematic bottom stress
    magnitude (m2/s2); time: model time (s).
    Returns the new BedState.
    """
    Nbed = bed.mass.shape[0]
    mass, thick, poro, age = bed.mass, bed.thick, bed.poro, bed.age

    # ---- 1. surface-layer exchange + deposit detection -----------------
    net = ero_flux - settling_flux            # (nsed,...) > 0 erosion
    depositing = net < 0.0
    fresh = (time > age[0] + 1.1 * cfg.dt) & \
        (thick[0] > newlayer_thick)           # new-layer gates
    dep_mass = jnp.where(depositing & fresh[None], -net, 0.0)
    age0 = jnp.where(jnp.any(depositing, axis=0), time, age[0])
    age = age.at[0].set(age0)
    mass = mass.at[0].set(jnp.maximum(mass[0] - net, 0.0))

    if Nbed > 1:
        # ---- 2. new-layer creation where total deposit > 0 -------------
        make_new = jnp.sum(dep_mass, axis=0) > 0.0        # (Mj, Li)
        # merge bottom two, push down, top becomes the deposit
        merged_mass = mass[Nbed - 2] + mass[Nbed - 1]
        merged_poro = 0.5 * (poro[Nbed - 2] + poro[Nbed - 1])
        merged_age = 0.5 * (age[Nbed - 2] + age[Nbed - 1])
        # pushed stacks: layer k <- k-1 (k=1..Nbed-2), bottom = merged
        new_mass = jnp.concatenate(
            [dep_mass[None],
             jnp.maximum(mass[0] - dep_mass, 0.0)[None],
             mass[1:Nbed - 2],
             merged_mass[None]], axis=0)
        new_poro = jnp.concatenate(
            [poro[:1], poro[:1], poro[1:Nbed - 2], merged_poro[None]],
            axis=0)
        new_age = jnp.concatenate(
            [jnp.full_like(age[:1], 0.0) + time, age[:1],
             age[1:Nbed - 2], merged_age[None]], axis=0)
        mass = jnp.where(make_new[None, None], new_mass, mass)
        poro = jnp.where(make_new[None], new_poro, poro)
        age = jnp.where(make_new[None], new_age, age)

    # ---- 3. rebuild thickness and fractions -----------------------------
    thick = _rebuild_thickness(sed, mass, poro)

    # ---- 4. active-layer entrainment (sed_bed.F:370-477) ----------------
    d50_top = sed.d50[0]
    tau_ce0 = sed.tau_ce[0] / cfg.rho0        # kinematic
    za = jnp.maximum(0.0, 0.007 * (tau_w - tau_ce0) * cfg.rho0) \
        + 6.0 * d50_top
    if Nbed == 1:
        return BedState(mass=mass, thick=thick, poro=poro, age=age)

    need = za > thick[0]
    to_add = jnp.maximum(za - thick[0], 0.0)
    # cumulative available thickness below the surface layer
    cum = jnp.cumsum(thick[1:], axis=0)       # (Nbed-1, ...)
    avail_tot = cum[-1]
    to_add = jnp.minimum(to_add, avail_tot)
    # Ksed = deepest layer partially consumed (reference 1-based; here
    # 0-based index into the full stack, in [1, Nbed-1])
    ksed = 1 + jnp.sum((cum < to_add[None]).astype(jnp.int32), axis=0)
    ksed = jnp.clip(ksed, 1, Nbed - 1)

    # retained fraction of the partially-consumed layer
    lidx = jnp.arange(Nbed)[:, None, None]
    thick_ksed = jnp.sum(jnp.where(lidx == ksed[None], thick, 0.0),
                         axis=0)
    avail_above = jnp.where(lidx[1:] <= ksed[None], thick[1:], 0.0)
    thck_avail = jnp.sum(avail_above, axis=0)
    cff2 = jnp.maximum(thck_avail - to_add, 0.0) / \
        jnp.maximum(thick_ksed, _EPS)

    # per-class: mass of layers 0..Ksed, split into new top + remainder
    in_range = (lidx[None] <= ksed[None, None])      # (1,Nbed,...) mask
    mass_l = mass.transpose(1, 0, 2, 3)              # (nsed, Nbed, ...)
    cum_mass = jnp.sum(jnp.where(in_range, mass_l, 0.0), axis=1)
    is_ksed = (lidx[None] == ksed[None, None])
    mass_ksed = jnp.sum(jnp.where(is_ksed, mass_l, 0.0), axis=1)
    keep_ksed = cff2[None] * mass_ksed
    top_new = cum_mass - keep_ksed

    # repack (sed_bed.F:447-477): the new stack is
    #   [entrained top, Ksed remainder, former Ksed+1..Nbed-1]
    # padded back to Nbed by splitting its LAST layer into ks+1 equal
    # sublayers (when Ksed is the bottom, the remainder itself splits).
    # Unrolled where-select over the static possible Ksed values.
    top_thick = thick[0] + to_add
    rem_thick = jnp.maximum(thck_avail - to_add, 0.0)
    new_mass = mass
    new_thick = thick
    new_poro = poro
    new_age = age
    for ks in range(1, Nbed):                 # Ksed (0-based)
        sel = need & (ksed == ks)
        nsplit = ks                            # layers consumed above
        mids_m = [keep_ksed] + [mass[k] for k in range(ks + 1, Nbed)]
        mids_t = [rem_thick] + [thick[k] for k in range(ks + 1, Nbed)]
        mids_p = [poro[ks]] + [poro[k] for k in range(ks + 1, Nbed)]
        mids_a = [age[ks]] + [age[k] for k in range(ks + 1, Nbed)]
        stack_m = [top_new] + mids_m[:-1] + \
            [mids_m[-1] / nsplit] * nsplit
        stack_t = [top_thick] + mids_t[:-1] + \
            [mids_t[-1] / nsplit] * nsplit
        stack_p = [poro[0]] + mids_p[:-1] + [mids_p[-1]] * nsplit
        stack_a = [age[0]] + mids_a[:-1] + [mids_a[-1]] * nsplit
        shift_m = jnp.stack(stack_m)
        shift_t = jnp.stack(stack_t)
        shift_p = jnp.stack(stack_p)
        shift_a = jnp.stack(stack_a)
        new_mass = jnp.where(sel[None, None], shift_m, new_mass)
        new_thick = jnp.where(sel[None], shift_t, new_thick)
        new_poro = jnp.where(sel[None], shift_p, new_poro)
        new_age = jnp.where(sel[None], shift_a, new_age)

    return BedState(mass=jnp.maximum(new_mass, 0.0),
                    thick=jnp.maximum(new_thick, 0.0),
                    poro=new_poro, age=new_age)


def bed_fractions(sed: SedConfig, bed: BedState):
    """Per-layer class fractions (bed_frac of sedbed_mod.h)."""
    tot = jnp.maximum(jnp.sum(bed.mass, axis=1, keepdims=True), _EPS)
    return bed.mass / tot


def total_thickness(bed: BedState):
    """bed_thick (SED_MORPH morphology diagnostic)."""
    return jnp.sum(bed.thick, axis=0)
