"""Mesh distribution: sharded likelihood evaluation over TPU slices."""

from chimera_tpu.parallel.mesh import (
    DATA_AXIS,
    init_distributed,
    PARAMS_AXIS,
    log_like_batch_sharded,
    make_mesh,
    pad_events,
    pad_injections,
    shard_hyperlikelihood,
)

__all__ = [
    "DATA_AXIS",
    "init_distributed",
    "PARAMS_AXIS",
    "log_like_batch_sharded",
    "make_mesh",
    "pad_events",
    "pad_injections",
    "shard_hyperlikelihood",
]
