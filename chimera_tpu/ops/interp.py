"""Linear interpolation helpers (per-event batched variants).

The hyper-likelihood interpolates per-event KDE densities from effective grids
onto analysis z-grids (reference: CHIMERA/likelihood.py:137,193) and inverts
cosmology tables (cosmo.py:260-264).  ``jnp.interp`` is 1-D; these wrappers
vmap it over leading batch axes with static zero/clamp boundary policies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def interp(x: Array, xp: Array, fp: Array, left=None, right=None) -> Array:
    """1-D linear interpolation (thin wrapper over ``jnp.interp``)."""
    return jnp.interp(x, xp, fp, left=left, right=right)


def interp_batch(x: Array, xp: Array, fp: Array, left=None, right=None) -> Array:
    """Row-wise interp: x (B, N), xp (B, M), fp (B, M) -> (B, N)."""
    return jax.vmap(lambda xi, xpi, fpi: jnp.interp(xi, xpi, fpi, left=left, right=right))(
        x, xp, fp
    )
