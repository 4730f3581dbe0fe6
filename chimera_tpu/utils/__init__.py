"""Utilities: magnitudes, profiling, plotting (matplotlib-gated)."""

from chimera_tpu.utils.mags import (
    abs_mag_from_app,
    app_mag_from_abs,
    lum_from_mag,
    mag_from_lum,
)
from chimera_tpu.utils.profiling import StageTimer, compile_time, device_trace

__all__ = [
    "abs_mag_from_app",
    "app_mag_from_abs",
    "lum_from_mag",
    "mag_from_lum",
    "StageTimer",
    "compile_time",
    "device_trace",
]
