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


def make_point_sources(cfg, locations, qbar_values, tsrc_values=None,
                       profile=None):
    """Build a Sources pytree from discrete (j, i) locations.

    qbar_values: m3/s per source; tsrc_values: (NT,) tracer values per
    source; profile: (N,) vertical distribution weights (defaults to
    uniform).
    """
    import numpy as np
    Mj, Li = cfg.shape2d
    N, NT = cfg.N, cfg.NT
    qbar = np.zeros((Mj, Li))
    qsrc = np.zeros((N, Mj, Li))
    tsrc = np.zeros((NT, N, Mj, Li))
    w = np.full(N, 1.0 / N) if profile is None else np.asarray(profile)
    for s, (j, i) in enumerate(locations):
        qbar[j, i] += qbar_values[s]
        qsrc[:, j, i] += qbar_values[s] * w
        if tsrc_values is not None:
            for itrc in range(NT):
                tsrc[itrc, :, j, i] = tsrc_values[s][itrc]
    return Sources(qbar=jnp.asarray(qbar, cfg.dtype),
                   qsrc=jnp.asarray(qsrc, cfg.dtype),
                   tsrc=jnp.asarray(tsrc, cfg.dtype))
