"""chimera_tpu — TPU-native hierarchical Bayesian standard-siren framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of CosmoStatGW/CHIMERA
(hyper-likelihood for GW standard-siren cosmology with galaxy catalogs,
population models, and injection-based selection effects), designed for
TPU meshes: pure-pytree models, batched masked kernels, in-program
collectives, and a fused Pallas KDE hot path.
"""

__version__ = "0.1.0"

from chimera_tpu import catalog, data, models, ops
from chimera_tpu.config import enable_x64, logger
from chimera_tpu.likelihood import (
    HyperLikelihood,
    compute_all,
    log_hyperlikelihood,
    log_hyperlikelihood_batch,
)
from chimera_tpu.selection import SelectionFunction

__all__ = [
    "catalog",
    "data",
    "models",
    "ops",
    "enable_x64",
    "logger",
    "HyperLikelihood",
    "compute_all",
    "log_hyperlikelihood",
    "log_hyperlikelihood_batch",
    "SelectionFunction",
]
