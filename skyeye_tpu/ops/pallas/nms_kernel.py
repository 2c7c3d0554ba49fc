"""Pallas TPU kernel: greedy class-aware NMS over a fixed candidate set.

North-star op (BASELINE.json): "anchor decode + class-aware NMS execute as a
fixed-shape Pallas kernel so the full image-in/boxes-out path never leaves HBM."

Design (see /opt/skills/guides/pallas_guide.md):
  * One kernel invocation per image. The top-k candidate set (k <= 4096) lives
    entirely in VMEM (4 x 4096 f32 coordinate rows = 64 KB), so the whole greedy
    suppression loop runs on-chip with zero HBM traffic.
  * Layout honors TPU tiling: coordinates are a (4, k) array (lanes = candidates),
    scores (1, k), outputs (1, max_det) — the last axis is always the 128-lane axis.
  * Boxes arrive pre-offset by class * MAX_WH (the class-offset trick,
    reference metrics.py:438-439), so one IoU pass is class-aware.
  * Each of the max_det steps does an argmax reduction + a vectorized IoU against
    all k candidates + a mask update — pure VPU work on (1, k) registers.

The lax reference implementation lives in skyeye_tpu/ops/nms.py (_greedy_nms); this
kernel computes the identical result (tests/test_pallas_kernels.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(coords_ref, scores_ref, keep_idx_ref, keep_valid_ref, *,
                max_det: int, iou_thres: float):
    """coords (4, k), scores (1, k) -> keep_idx (1, max_det), keep_valid (1, max_det)."""
    x1 = coords_ref[0:1, :]  # (1, k)
    y1 = coords_ref[1:2, :]
    x2 = coords_ref[2:3, :]
    y2 = coords_ref[3:4, :]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    k = x1.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, live):
        best_score = jnp.max(live)
        valid = best_score > 0.0
        is_best = live == best_score
        # first index achieving the max (argmax with deterministic tie-break)
        best = jnp.min(jnp.where(is_best, col_ids, k))
        best_onehot = (col_ids == best).astype(x1.dtype)  # (1, k)

        # broadcast the winner's coordinates via masked reduction (no dynamic slice)
        bx1 = jnp.sum(x1 * best_onehot)
        by1 = jnp.sum(y1 * best_onehot)
        bx2 = jnp.sum(x2 * best_onehot)
        by2 = jnp.sum(y2 * best_onehot)
        barea = jnp.sum(area * best_onehot)

        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        iou = inter / (area + barea - inter + 1e-7)

        suppress = ((iou > iou_thres) & valid) | (col_ids == best)
        live = jnp.where(suppress, -1.0, live)

        keep_idx_ref[0, i] = jnp.where(valid, best, 0).astype(jnp.int32)
        keep_valid_ref[0, i] = valid.astype(jnp.int32)
        return live

    jax.lax.fori_loop(0, max_det, body, scores_ref[:], unroll=False)


@functools.partial(jax.jit, static_argnames=("max_det", "iou_thres", "interpret"))
def pallas_greedy_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_det: int = 300,
    iou_thres: float = 0.45,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS for one image's candidate set.

    boxes: (k, 4) xyxy already class-offset; scores: (k,) with invalid slots < 0.
    Returns (keep_idx (max_det,) int32, keep_valid (max_det,) bool) — identical to
    ops.nms._greedy_nms.
    """
    coords = boxes.T.astype(jnp.float32)          # (4, k)
    scores2 = scores.reshape(1, -1).astype(jnp.float32)
    keep_idx, keep_valid = pl.pallas_call(
        functools.partial(_nms_kernel, max_det=max_det, iou_thres=iou_thres),
        out_shape=(
            jax.ShapeDtypeStruct((1, max_det), jnp.int32),
            jax.ShapeDtypeStruct((1, max_det), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            # per-step winners are scalar stores -> SMEM (VMEM rejects scalar stores)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(coords, scores2)
    return keep_idx[0], keep_valid[0].astype(bool)


def pallas_backend_ok() -> bool:
    """True when the compiled (non-interpret) kernel path can run."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
