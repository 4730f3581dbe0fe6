"""Population models: cosmology, masses, rates, and the population wrapper."""

from chimera_tpu.models.cosmology import FLRW, MGFLRW
from chimera_tpu.models.mass import (
    BaseMassModel,
    BrokenPowerLaw,
    PowerLawPeak,
    PowerLawSpline,
    PowerLawTwoPeaks,
    TruncatedPowerLaw,
    p_m1m2,
)
from chimera_tpu.models.population import (
    Population,
    compute_z_grids,
    n_cbc_1yr,
    p_cbc,
    pop_rate_det,
    theta_det_to_src,
    theta_src_and_weights,
)
from chimera_tpu.models.rate import (
    BaseRateModel,
    MadauDickinsonRate,
    PowerLawRate,
    TruncatedMadauDickinsonRate,
    TruncatedPowerLawRate,
    merger_rate,
)

__all__ = [
    "FLRW",
    "MGFLRW",
    "BaseMassModel",
    "TruncatedPowerLaw",
    "BrokenPowerLaw",
    "PowerLawPeak",
    "PowerLawTwoPeaks",
    "PowerLawSpline",
    "p_m1m2",
    "BaseRateModel",
    "PowerLawRate",
    "TruncatedPowerLawRate",
    "MadauDickinsonRate",
    "TruncatedMadauDickinsonRate",
    "merger_rate",
    "Population",
    "compute_z_grids",
    "n_cbc_1yr",
    "p_cbc",
    "pop_rate_det",
    "theta_det_to_src",
    "theta_src_and_weights",
]
