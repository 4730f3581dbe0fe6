"""Data structs, loaders, mock generators, and the pixelization pipeline."""

from chimera_tpu.data.localization import localization_areas, localization_volumes
from chimera_tpu.data.structs import PAD_VALUE, ThetaInjDet, ThetaPEDet, ThetaSrc

__all__ = [
    "PAD_VALUE",
    "ThetaInjDet",
    "ThetaPEDet",
    "ThetaSrc",
    "localization_areas",
    "localization_volumes",
]
