"""Inference drivers: ensemble MCMC, gradient-based HMC, checkpointing."""

from chimera_tpu.inference.hmc import (
    make_transformed_log_prob,
    run_hmc,
    sample_hyperposterior,
)
from chimera_tpu.inference.ensemble import (
    EnsembleState,
    init_state,
    initialize_walkers,
    make_vector_log_prob,
    run,
    step,
)
from chimera_tpu.inference.checkpoint import (
    latest_chain_file,
    load_chain,
    load_state,
    next_chain_file,
    save_chain,
)

__all__ = [
    "make_transformed_log_prob",
    "run_hmc",
    "sample_hyperposterior",
    "EnsembleState",
    "init_state",
    "initialize_walkers",
    "make_vector_log_prob",
    "run",
    "step",
    "latest_chain_file",
    "load_chain",
    "load_state",
    "next_chain_file",
    "save_chain",
]
