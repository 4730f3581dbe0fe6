"""Pallas TPU kernels for the hyper-likelihood hot path."""

from chimera_tpu.ops.pallas.kde import kde1d_grid

__all__ = ["kde1d_grid"]
