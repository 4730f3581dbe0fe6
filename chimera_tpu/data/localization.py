"""Event localization areas and volumes.

Capability parity with CHIMERA/data.py:426-484 — the reference's
``compute_localization_volumes`` referenced undefined symbols (SURVEY.md 2.4);
this is the corrected, vectorized implementation.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from chimera_tpu.models import cosmology as cosmo_fns


def localization_areas(theta: Array, phi: Array, percentile: float = 90.0,
                       unit: str = "deg2") -> Array:
    """Gaussian-covariance sky areas at the given confidence (data.py:426-450).

    theta, phi: (Nev, Nsamples) angular PE samples.  Returns (Nev,) areas.
    """
    theta = jnp.atleast_2d(theta)
    phi = jnp.atleast_2d(phi)
    var_t = jnp.var(theta, axis=1)
    var_p = jnp.var(phi, axis=1)
    mean_t = jnp.mean(theta, axis=1)
    cov_tp = jnp.mean(
        (theta - mean_t[:, None]) * (phi - jnp.mean(phi, axis=1)[:, None]),
        axis=1)
    one_sigma = (2.0 * jnp.pi * jnp.abs(jnp.sin(mean_t))
                 * jnp.sqrt(jnp.maximum(var_t * var_p - cov_tp**2, 0.0)))
    area_rad2 = -jnp.log(1.0 - percentile / 100.0) * one_sigma
    if unit == "deg2":
        return area_rad2 * (180.0 / jnp.pi) ** 2
    return area_rad2


def localization_volumes(theta: Array, phi: Array, dl: Array,
                         cosmo_min, cosmo_max,
                         percentile: float = 90.0) -> Array:
    """Localization comoving volumes in Gpc^3 at prior-extreme cosmologies
    (corrected version of data.py:452-484).

    The dL band is the central ``percentile`` interval; its comoving-volume
    bounds are taken under the two extreme cosmologies so the shell covers
    the full prior range.  For the shell to be a *covering* volume,
    ``cosmo_min`` should be the prior corner minimizing comoving distance at
    fixed dL (high H0) and ``cosmo_max`` the corner maximizing it (low H0).
    """
    dl = jnp.atleast_2d(dl)
    areas_rad2 = localization_areas(theta, phi, percentile, unit="rad2")
    lo_q = (100.0 - percentile) / 2.0
    dl_min = jnp.percentile(dl, lo_q, axis=1)
    dl_max = jnp.percentile(dl, 100.0 - lo_q, axis=1)
    z_min = cosmo_fns.z_from_dgw(cosmo_min, dl_min)
    z_max = cosmo_fns.z_from_dgw(cosmo_max, dl_max)
    v_min = cosmo_fns.comoving_volume(cosmo_min, z_min)
    v_max = cosmo_fns.comoving_volume(cosmo_max, z_max)
    return areas_rad2 * (v_max - v_min) / (4.0 * jnp.pi)
