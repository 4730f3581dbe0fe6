"""Magnitude <-> luminosity conversions (reference CHIMERA/utils/mags.py:19-62).

The reference supported only one direction per band and silently returned
``None`` for unsupported bands (a bare ``ValueError("...")`` expression, never
raised); here both directions cover all bands and unknown bands raise.  Adds
distance-modulus conversions and the Schechter luminosity fraction used for
luminosity-weighted galaxy catalogs (the reference imported ``gammaincc`` for
this but never shipped it).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array
from jax.scipy.special import gammainc

# Solar absolute magnitudes per band (reference mags.py:29-37).
M_SUN = {"bol": 4.83, "B": 4.72, "W1": 3.24, "K": 3.27}


def _msun(band: str) -> float:
    try:
        return M_SUN[band]
    except KeyError:
        raise ValueError(f"unsupported band {band!r}; one of {list(M_SUN)}")


def mag2lum(M: Array, band: str = "K") -> Array:
    """Absolute magnitude -> luminosity in solar units (mags.py:19-40)."""
    return jnp.power(10.0, 0.4 * (_msun(band) - jnp.asarray(M)))


def lum2mag(L: Array, band: str = "K") -> Array:
    """Luminosity in solar units -> absolute magnitude (mags.py:43-62)."""
    return -2.5 * jnp.log10(jnp.asarray(L)) + _msun(band)


def absolute_magnitude(m: Array, dl_gpc: Array) -> Array:
    """Apparent -> absolute magnitude via the distance modulus
    (dL in Gpc, the framework's distance unit)."""
    return jnp.asarray(m) - 5.0 * jnp.log10(jnp.asarray(dl_gpc) * 1e9 / 10.0)


def apparent_magnitude(M: Array, dl_gpc: Array) -> Array:
    """Absolute -> apparent magnitude via the distance modulus."""
    return jnp.asarray(M) + 5.0 * jnp.log10(jnp.asarray(dl_gpc) * 1e9 / 10.0)


def schechter_luminosity_fraction(L_min: Array, alpha: float = -1.07,
                                  weighted: bool = True) -> Array:
    """Fraction of total (luminosity-weighted) density above ``L_min/L*``
    for a Schechter function phi(x) ~ x^alpha e^-x.

    With ``weighted`` the integrand carries an extra factor of x (luminosity
    weighting); the result is Gamma(alpha + 2, L_min) / Gamma(alpha + 2)
    (regularized).  Unweighted requires alpha > -1 to converge.
    """
    a = alpha + 2.0 if weighted else alpha + 1.0
    x = jnp.asarray(L_min)
    return 1.0 - gammainc(a, x)
