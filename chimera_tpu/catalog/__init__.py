"""Galaxy-catalog redshift priors and completeness models."""

from chimera_tpu.catalog.completeness import (
    DVdzCompleteness,
    HomogeneousCompleteness,
)
from chimera_tpu.catalog.empty import EmptyCatalog
from chimera_tpu.catalog.pixelated import PixelatedCatalog

__all__ = [
    "DVdzCompleteness",
    "HomogeneousCompleteness",
    "EmptyCatalog",
    "PixelatedCatalog",
]
