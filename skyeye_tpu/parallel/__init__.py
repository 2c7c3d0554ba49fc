"""Mesh/sharding utilities for multi-chip SPMD execution."""
from .mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    create_mesh,
    is_main_process,
    local_batch_size,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "SPATIAL_AXIS",
    "batch_sharding",
    "create_mesh",
    "is_main_process",
    "local_batch_size",
    "replicated",
    "shard_batch",
]
