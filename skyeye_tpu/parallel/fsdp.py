"""FSDP / ZeRO-style sharded training state over the mesh's data axis.

The reference's distributed story tops out at DDP — every rank holds a FULL
replica of params, gradients, optimizer state and EMA
(/root/reference/skyeye/cli/train.py:21 DistributedDataParallel). That caps the
trainable model size at one device's HBM. TPU-native redesign: shard every
training-state leaf (params, momentum, EMA, BatchNorm stats) across the mesh's
"data" axis on its largest divisible dimension and let XLA GSPMD schedule the
ZeRO-3 pattern over ICI — weights are all-gathered just-in-time for each layer's
use, gradients come back as reduce-scatter instead of all-reduce, and the
optimizer update runs on each device's 1/N shard. Per-device state memory drops
by ~N_data while the math stays bit-for-the-same-reduction-order identical to
data parallelism (tests/test_train.py::test_train_step_fsdp_matches_unsharded).

No reference counterpart exists (capability beyond the reference); the JAX
recipe follows the public scaling-book pattern: placement IS the program —
`jax.device_put` the state onto sharded layouts, pin the jitted step's
out_shardings so the updated state stays sharded, and XLA inserts all
collectives.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, replicated


def leaf_sharding(mesh: Mesh, x: Any, axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding for one state leaf: partition the largest dimension divisible
    by the axis size (conv kernels -> c_out, biases/BN vectors -> channels);
    leaves with no divisible dimension (scalars, tiny heads) stay replicated."""
    n = int(mesh.shape[axis])
    shape = tuple(getattr(x, "shape", ()))
    if n <= 1 or not shape:
        return replicated(mesh)
    for d in sorted(range(len(shape)), key=lambda i: shape[i], reverse=True):
        if shape[d] >= n and shape[d] % n == 0:
            spec = [None] * len(shape)
            spec[d] = axis
            return NamedSharding(mesh, P(*spec))
    return replicated(mesh)


def state_shardings(mesh: Mesh, state: Any, axis: str = DATA_AXIS) -> Any:
    """Pytree of NamedShardings mirroring `state` (params / opt_state / EMA /
    batch_stats / step all included — optimizer accumulators mirror their
    params' shapes, so the same rule shards them identically)."""
    return jax.tree_util.tree_map(lambda x: leaf_sharding(mesh, x, axis), state)


def shard_train_state(mesh: Mesh, state: Any, axis: str = DATA_AXIS) -> Any:
    """Place a TrainState onto the mesh with ZeRO-sharded leaves."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, state_shardings(mesh, state, axis)
    )


def jit_fsdp_step(step_fn, mesh: Mesh, state: Any, axis: str = DATA_AXIS):
    """Jit a train step with the updated state PINNED to the sharded layout.

    Without out_shardings XLA's propagation usually keeps the layout, but
    "usually" re-replicates silently on pattern changes; pinning makes the
    memory invariant a compile-time guarantee. Metrics (second output) are
    scalar losses -> replicated prefix.
    """
    return jax.jit(
        step_fn,
        out_shardings=(state_shardings(mesh, state, axis), replicated(mesh)),
    )
