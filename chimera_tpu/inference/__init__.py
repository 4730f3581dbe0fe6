"""Inference drivers: JAX-native ensemble MCMC + chain checkpointing."""

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
