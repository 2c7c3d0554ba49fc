"""Device mesh + sharding utilities — the TPU-native replacement for DDP/NCCL.

Capability parity (reference, SURVEY.md §2.6): the reference's distributed story is
torch DDP — `DistributedDataParallel` (skyeye/cli/train.py:21), `DistributedSampler`
(skyeye/core/data/loaders.py:57-61), rank-0 barriers (skyeye/utils/torch_utils.py:24-36)
with NCCL all-reduce implied. TPU-native redesign: a `jax.sharding.Mesh` over
("data", "spatial") axes; the train step is jitted with sharding annotations and XLA
inserts the gradient psum over ICI. No process groups, no samplers — inputs are
sharded by batch (data parallelism) and optionally by image rows (spatial
partitioning, the CNN analogue of sequence parallelism: XLA GSPMD performs conv halo
exchange automatically).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def create_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ("data", "spatial") mesh over the available devices.

    Defaults to pure data parallelism over all devices (n_spatial=1).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    if n_data * n_spatial != len(devices):
        devices = devices[: n_data * n_spatial]
    arr = np.array(devices).reshape(n_data, n_spatial)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, spatial_dim: Optional[int] = None) -> NamedSharding:
    """Sharding for an image batch (B, H, W, C): batch over data axis, optionally
    rows over the spatial axis (GSPMD handles conv halos)."""
    if spatial_dim is None:
        return NamedSharding(mesh, P(DATA_AXIS))
    spec = [DATA_AXIS, None, None, None]
    spec[spatial_dim] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, spatial: bool = False):
    """Place a host batch pytree onto the mesh: arrays with a leading batch dim are
    sharded over the data axis; rank-4 image tensors optionally spatially sharded."""
    def place(x):
        x = np.asarray(x)
        if x.ndim >= 4 and spatial:
            sh = NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
        elif x.ndim >= 1:
            sh = NamedSharding(mesh, P(DATA_AXIS))
        else:
            sh = replicated(mesh)
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(place, batch)


def shard_batch_multihost(mesh: Mesh, local_batch):
    """Multi-host (DCN) batch placement: each process passes its LOCAL slice of the
    global batch and gets back global jax.Arrays sharded over the data axis.

    This is the multi-controller analogue of `shard_batch` — the TPU-native
    replacement for the reference's DistributedSampler + DDP input split
    (/root/reference/skyeye/core/data/loaders.py:57-61, cli/train.py:17-21): each
    host loads only its own rows; `jax.make_array_from_process_local_data`
    assembles the logical global array without any cross-host data movement.
    Scalars / rank-0 arrays are treated as replicated (every process must pass the
    same value).
    """
    def place(x):
        x = np.asarray(x)
        if x.ndim >= 1:
            sh = NamedSharding(mesh, P(DATA_AXIS))
            gshape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(sh, x, gshape)
        return jax.make_array_from_process_local_data(replicated(mesh), x, x.shape)

    return jax.tree_util.tree_map(place, local_batch)


def replicate_multihost(mesh: Mesh, tree):
    """Replicate a pytree (e.g. model params) across every device of a
    multi-process mesh. Each process must pass identical values (same-seed init)."""
    def place(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(replicated(mesh), x, x.shape)

    return jax.tree_util.tree_map(place, tree)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host initialization (replaces torch.distributed.init_process_group,
    SURVEY.md §2.6/§5.8). No-op for single-process runs; on multi-host TPU pods the
    runtime usually autodetects all arguments."""
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_main_process() -> bool:
    """Rank-0 gate (replaces reference's RANK env checks, general.py:33-36)."""
    return jax.process_index() == 0


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by data axis {n}")
    return global_batch // n
