"""Magnitude <-> luminosity conversions (reference CHIMERA/utils/mags.py:19-62).

Solar absolute magnitudes per band from the reference; used for
luminosity-weighted host-galaxy probabilities.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

M_SUN = {"bol": 4.74, "B": 5.497, "W1": 3.24, "K": 3.27}


def lum_from_mag(mag: Array, band: str = "bol") -> Array:
    """Luminosity in solar units from absolute magnitude."""
    return jnp.power(10.0, 0.4 * (M_SUN[band] - mag))


def mag_from_lum(lum: Array, band: str = "bol") -> Array:
    """Absolute magnitude from luminosity in solar units."""
    return M_SUN[band] - 2.5 * jnp.log10(lum)


def abs_mag_from_app(app_mag: Array, dl_gpc: Array) -> Array:
    """Absolute from apparent magnitude at luminosity distance dL [Gpc]."""
    return app_mag - 5.0 * jnp.log10(dl_gpc * 1e9) + 5.0


def app_mag_from_abs(abs_mag: Array, dl_gpc: Array) -> Array:
    return abs_mag + 5.0 * jnp.log10(dl_gpc * 1e9) - 5.0
