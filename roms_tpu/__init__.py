"""roms_tpu — a TPU-native regional ocean dynamical core.

A ground-up JAX/XLA re-design of the capabilities of the reference
split-explicit, free-surface, hydrostatic primitive-equation ocean model
(myroms/roms): terrain-following vertical coordinates on a curvilinear
Arakawa C-grid, a fast barotropic mode sub-cycled inside a single jitted
baroclinic step, batched-implicit vertical solves, and SPMD domain
decomposition via `jax.sharding` + `shard_map` with ICI collective halo
exchange.
"""

from . import constants
from .config import ModelConfig

__version__ = "0.1.0"
