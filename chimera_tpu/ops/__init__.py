"""Numerics core: integration, binning, KDE, interpolation, HEALPix."""

from chimera_tpu.ops.binning import binning1d, binning1d_batch
from chimera_tpu.ops.integrate import (
    cumtrapz,
    masked_trapz,
    neumaier_sum,
    sum_and_sumsq,
    trapz,
)
from chimera_tpu.ops.chebyshev import (
    cheb_nodes,
    chebeval,
    chebfit_from_fn,
    chebfit_from_table,
    chebfit_from_values,
)
from chimera_tpu.ops.interp import interp, interp_batch, uniform_interp
from chimera_tpu.ops.kde import (
    gaussian_kde_nd,
    gaussian_kde_nd_batch,
    kde1d,
    kde1d_batch,
)

__all__ = [
    "binning1d",
    "binning1d_batch",
    "cumtrapz",
    "masked_trapz",
    "neumaier_sum",
    "sum_and_sumsq",
    "trapz",
    "interp",
    "interp_batch",
    "uniform_interp",
    "cheb_nodes",
    "chebeval",
    "chebfit_from_fn",
    "chebfit_from_table",
    "chebfit_from_values",
    "gaussian_kde_nd",
    "gaussian_kde_nd_batch",
    "kde1d",
    "kde1d_batch",
]
