"""Mesh/sharding utilities for multi-chip SPMD execution."""
from .fsdp import jit_fsdp_step, leaf_sharding, shard_train_state, state_shardings
from .mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    create_mesh,
    initialize_distributed,
    is_main_process,
    local_batch_size,
    replicate_multihost,
    replicated,
    shard_batch,
    shard_batch_multihost,
)

__all__ = [
    "DATA_AXIS",
    "jit_fsdp_step",
    "leaf_sharding",
    "shard_train_state",
    "state_shardings",
    "SPATIAL_AXIS",
    "batch_sharding",
    "create_mesh",
    "initialize_distributed",
    "is_main_process",
    "local_batch_size",
    "replicate_multihost",
    "replicated",
    "shard_batch",
    "shard_batch_multihost",
]
