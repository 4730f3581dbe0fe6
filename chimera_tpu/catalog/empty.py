"""Catalog-free ("spectral siren") redshift prior.

Parity with CHIMERA/catalog/catalog.py:19-43: p_gal = p_bkg = dV_C/dz.
"""

from __future__ import annotations

from typing import ClassVar

from jax import Array

from chimera_tpu import pytree
from chimera_tpu.data.structs import ThetaSrc
from chimera_tpu.models import cosmology as cosmo_fns


@pytree.dataclass
class EmptyCatalog:
    """Homogeneous redshift prior for catalog-free standard sirens."""

    name: ClassVar[str] = "empty_catalog"

    @property
    def pixelated(self) -> bool:
        return False

    def p_gal(self, cosmo, z: Array) -> Array:
        """p_gal(z) = dV_C/dz — shape follows ``z`` (e.g. (Nev, Nz))."""
        return cosmo_fns.differential_comoving_volume(cosmo, z)

    def p_bkg(self, cosmo, theta_or_z) -> Array:
        """Background prior for selection effects; accepts ThetaSrc (so MG
        cosmologies de-modify measured distances) or a plain z array."""
        if isinstance(theta_or_z, ThetaSrc):
            return cosmo_fns.differential_comoving_volume(
                cosmo, theta_or_z.z, theta_or_z.original_distances)
        return cosmo_fns.differential_comoving_volume(cosmo, theta_or_z)
