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


def uniform_interp(x: Array, lo: Array, hi: Array, fp: Array,
                   left: float = 0.0, right: float = 0.0) -> Array:
    """Linear interp on a *uniform* node grid: index arithmetic instead of
    searchsorted (no binary search — one fused gather pair).

    Used for the KDE effective grids, which are linspace by construction
    (likelihood.py:115-121): x (N,), fp (M,) on nodes linspace(lo, hi, M).
    Out-of-range values get ``left``/``right`` like the reference's
    jnp.interp(..., left=0, right=0).
    """
    m = fp.shape[-1]
    t = (x - lo) / (hi - lo) * (m - 1)
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, m - 2)
    frac = t - i
    val = fp[i] * (1.0 - frac) + fp[i + 1] * frac
    val = jnp.where(x < lo, left, val)
    return jnp.where(x > hi, right, val)
