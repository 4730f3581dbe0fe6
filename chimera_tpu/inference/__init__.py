"""Inference drivers: ensemble MCMC, gradient-based HMC, checkpointing."""

from chimera_tpu.inference.hmc import (
    continue_hmc,
    make_transformed_log_prob,
    make_transformed_log_prob_batch,
    run_hmc,
    sample_hyperposterior,
)
from chimera_tpu.inference.chees import (
    run_chees,
    sample_hyperposterior_chees,
)
from chimera_tpu.inference.diagnostics import (
    effective_sample_size,
    rhat,
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
    load_hmc,
    load_state,
    next_chain_file,
    save_chain,
    save_hmc,
)

__all__ = [
    "continue_hmc",
    "make_transformed_log_prob",
    "make_transformed_log_prob_batch",
    "run_hmc",
    "run_chees",
    "sample_hyperposterior",
    "sample_hyperposterior_chees",
    "effective_sample_size",
    "rhat",
    "save_hmc",
    "load_hmc",
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
