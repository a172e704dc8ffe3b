"""River runoff / point sources (mod_sources.F, LwSrc/LtracerSrc).

The reference injects discrete sources at (Isrc, Jsrc) cells inside the
fast loop (step2d mass) and step3d_t (tracer mass).  Dense-mask
formulation: a (Mj, Li) field of vertically integrated volume flux Qbar
[m3/s] at source cells (zero elsewhere) updates the free surface every
fast step,

    zeta += Qbar * pm * pn * dtfast            (step2d LwSrc block)

and a per-layer flux Qsrc [m3/s] with source tracer values Tsrc feeds
the tracer corrector seed,

    t_part += dt * pm * pn * Qsrc * Tsrc       (step3d_t LwSrc block).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class Sources(NamedTuple):
    qbar: jnp.ndarray              # (Mj, Li) m3/s at source cells
    qsrc: Optional[jnp.ndarray] = None    # (N, Mj, Li) per-layer split
    tsrc: Optional[jnp.ndarray] = None    # (NT, N, Mj, Li) source values
    # LuvSrc horizontal-face variant (mod_sources.F Dsrc=0/1): fluxes
    # carried on the U/V grids with the C-grid sign convention
    # (positive = into the cell east/north of the face); typically on
    # land-masked boundary faces so only the receiving cell feels them.
    qbar_u: Optional[jnp.ndarray] = None  # (Mj, Li) at u points
    qbar_v: Optional[jnp.ndarray] = None
    qsrc_u: Optional[jnp.ndarray] = None  # (N, Mj, Li)
    qsrc_v: Optional[jnp.ndarray] = None


def make_point_sources(cfg, locations, qbar_values, tsrc_values=None,
                       profile=None, directions=None):
    """Build a Sources pytree from discrete (j, i) locations.

    qbar_values: m3/s per source; tsrc_values: (NT,) tracer values per
    source; profile: (N,) vertical distribution weights (defaults to
    uniform); directions: per-source "w" (vertical LwSrc, default),
    "u" or "v" (LuvSrc horizontal-face, the (j, i) being the U/V-grid
    face index; positive flux flows into the cell east/north of it).
    """
    import numpy as np
    Mj, Li = cfg.shape2d
    N, NT = cfg.N, cfg.NT
    qbar = np.zeros((Mj, Li))
    qsrc = np.zeros((N, Mj, Li))
    qbar_u = np.zeros((Mj, Li))
    qbar_v = np.zeros((Mj, Li))
    qsrc_u = np.zeros((N, Mj, Li))
    qsrc_v = np.zeros((N, Mj, Li))
    tsrc = np.zeros((NT, N, Mj, Li))
    w = np.full(N, 1.0 / N) if profile is None else np.asarray(profile)
    dirs = directions or ["w"] * len(locations)
    any_uv = False
    for s, (j, i) in enumerate(locations):
        d = dirs[s]
        if d == "u":
            qbar_u[j, i] += qbar_values[s]
            qsrc_u[:, j, i] += qbar_values[s] * w
            any_uv = True
        elif d == "v":
            qbar_v[j, i] += qbar_values[s]
            qsrc_v[:, j, i] += qbar_values[s] * w
            any_uv = True
        else:
            qbar[j, i] += qbar_values[s]
            qsrc[:, j, i] += qbar_values[s] * w
        if tsrc_values is not None:
            for itrc in range(NT):
                tsrc[itrc, :, j, i] = tsrc_values[s][itrc]
    kw = {}
    if any_uv:
        kw = dict(qbar_u=jnp.asarray(qbar_u, cfg.dtype),
                  qbar_v=jnp.asarray(qbar_v, cfg.dtype),
                  qsrc_u=jnp.asarray(qsrc_u, cfg.dtype),
                  qsrc_v=jnp.asarray(qsrc_v, cfg.dtype))
    return Sources(qbar=jnp.asarray(qbar, cfg.dtype),
                   qsrc=jnp.asarray(qsrc, cfg.dtype),
                   tsrc=jnp.asarray(tsrc, cfg.dtype), **kw)
