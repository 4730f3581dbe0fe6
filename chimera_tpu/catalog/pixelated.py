"""Pixelated galaxy-catalog redshift prior — hot-path struct.

Parity with CHIMERA/catalog/catalog.py:51-231.  This module holds the
*device-resident* part consumed by the jitted likelihood: precomputed
``p_cat`` (per event / pixel / z), galaxy counts, completeness ``P_compl``,
and the mixture

    p_gal = fR(lambda_c) * p_cat + (1 - P_compl) * p_bkg(lambda_c)

with explicit pixel masks instead of the reference's -100 sentinels.
``p_cat`` itself is precomputed at the fiducial cosmology (the reference makes
the same approximation — catalog.py:219); trial-cosmology dependence enters
through fR and p_bkg only.

The offline builder (galaxy binning, sum-of-Gaussians) lives in
chimera_tpu.catalog.build so this file stays import-light for the hot path.
"""

from __future__ import annotations

from typing import ClassVar

import jax.numpy as jnp
from jax import Array

from chimera_tpu import pytree
from chimera_tpu.data.structs import ThetaSrc


@pytree.dataclass
class PixelatedCatalog:
    """Device-resident pixelated catalog prior.

    Shapes: p_cat (Nev, P, Nz); P_compl (Nev, 1, Nz); pixel_mask (Nev, P);
    n_gal (Nev,).  ``completeness`` is one of the models in
    chimera_tpu.catalog.completeness.
    """

    p_cat: Array = None
    P_compl: Array = None
    pixel_mask: Array = None
    n_gal: Array = None
    completeness: object = None

    name: ClassVar[str] = "pixelated_catalog"

    @property
    def pixelated(self) -> bool:
        return True

    @property
    def max_npixels(self) -> int:
        return self.p_cat.shape[1]

    @property
    def neff_pixels(self) -> Array:
        return jnp.sum(self.pixel_mask, axis=-1)

    def p_gal(self, cosmo, z: Array) -> Array:
        """Catalog + completeness mixture on per-event z-grids.

        z has shape (Nev, Nz); returns (Nev, P, Nz) with masked pixels zeroed
        (reference catalog.py:197-203 returns -100 there; downstream both
        conventions integrate to the same value — see likelihood integrand).
        """
        fR = self.completeness.fR(cosmo)
        p_bkg = self.completeness.p_bkg(cosmo, z)[:, None, :]  # (Nev, 1, Nz)
        mix = fR * self.p_cat + (1.0 - self.P_compl) * p_bkg
        return jnp.where(self.pixel_mask[:, :, None], mix, 0.0)

    def p_bkg(self, cosmo, theta_or_z) -> Array:
        return self.completeness.p_bkg(cosmo, theta_or_z)
