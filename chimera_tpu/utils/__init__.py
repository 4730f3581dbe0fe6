"""Utilities: magnitudes, profiling, device provisioning, plotting
(matplotlib-gated)."""

from chimera_tpu.utils.devices import ensure_virtual_devices
from chimera_tpu.utils.mags import (
    absolute_magnitude,
    apparent_magnitude,
    lum2mag,
    mag2lum,
    schechter_luminosity_fraction,
)
from chimera_tpu.utils.profiling import StageTimer, compile_time, device_trace

__all__ = [
    "ensure_virtual_devices",
    "mag2lum",
    "lum2mag",
    "absolute_magnitude",
    "apparent_magnitude",
    "schechter_luminosity_fraction",
    "StageTimer",
    "compile_time",
    "device_trace",
]
