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


_SUBLANES = 8  # VPU register rows: (8, k/8) shapes use all sublanes, (1, k) only one


def _nms_kernel(coords_ref, scores_ref, keep_idx_ref, keep_valid_ref, *,
                max_det: int, iou_thres: float):
    """coords (4, k), scores (1, k) -> keep_idx (1, max_det), keep_valid (1, max_det).

    Perf-critical layout: every per-step vector op runs on (8, k/8) registers so the
    full 8x128 VPU is busy (a (1, k) layout would idle 7 of 8 sublanes — measured 2x
    slower than the lax fallback). The winner's coordinates are extracted by masked
    reductions (Mosaic cannot prove alignment for dynamic lane-offset loads, so a
    coords_ref[:, pl.ds(best, 1)] gather does not compile).
    """
    k = coords_ref.shape[1]
    km = k // _SUBLANES
    # row-major (8, k/8): element (r, c) is candidate r*km + c
    x1 = coords_ref[0:1, :].reshape(_SUBLANES, km)
    y1 = coords_ref[1:2, :].reshape(_SUBLANES, km)
    x2 = coords_ref[2:3, :].reshape(_SUBLANES, km)
    y2 = coords_ref[3:4, :].reshape(_SUBLANES, km)
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    gidx = (
        jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, km), 0) * km
        + jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, km), 1)
    )

    # zero-init outputs, then early-exit the greedy loop once nothing is live —
    # at serving thresholds real detections << max_det, so this cuts the step
    # count from max_det to (n_kept + 1)
    def init_body(i, _):
        keep_idx_ref[0, i] = 0
        keep_valid_ref[0, i] = 0
        return 0

    jax.lax.fori_loop(0, max_det, init_body, 0, unroll=False)

    def cond(carry):
        i, live, prev_alive = carry
        return (i < max_det) & prev_alive

    def body(carry):
        i, live, _ = carry
        best_score = jnp.max(live)
        valid = best_score > 0.0
        # first index achieving the max (argmax with deterministic tie-break)
        best = jnp.min(jnp.where(live == best_score, gidx, k))

        onehot = gidx == best  # (8, km); exactly one element set when valid
        bx1 = jnp.sum(jnp.where(onehot, x1, 0.0))
        by1 = jnp.sum(jnp.where(onehot, y1, 0.0))
        bx2 = jnp.sum(jnp.where(onehot, x2, 0.0))
        by2 = jnp.sum(jnp.where(onehot, y2, 0.0))
        barea = jnp.sum(jnp.where(onehot, area, 0.0))

        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        iou = inter / (area + barea - inter + 1e-7)

        suppress = ((iou > iou_thres) & valid) | onehot
        live = jnp.where(suppress, -1.0, live)

        @pl.when(valid)
        def _():
            keep_idx_ref[0, i] = best.astype(jnp.int32)
            keep_valid_ref[0, i] = 1

        return i + 1, live, valid

    live0 = scores_ref[:].reshape(_SUBLANES, km)
    jax.lax.while_loop(cond, body, (jnp.int32(0), live0, jnp.bool_(True)))


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
    k = boxes.shape[0]
    # kernel reshapes the (1, k) candidate rows to (8, k/8): k/8 is the LANE
    # dim of that layout, so it must be a multiple of 128 or Mosaic rejects the
    # shape cast ("infer-vector-layout: unsupported shape cast" — hit at
    # k=1008, the 128px candidate count). Pad to a multiple of 8*128.
    pad = (-k) % (_SUBLANES * 128)
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        scores = jnp.pad(scores, (0, pad), constant_values=-1.0)
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


def _nms_batched_kernel(x1_ref, y1_ref, x2_ref, y2_ref, scores_ref,
                        keep_idx_ref, keep_valid_ref, *,
                        max_det: int, iou_thres: float):
    """Lockstep greedy NMS for a whole batch: refs are (b, k); outputs (b, md_p).

    vmapping the single-image kernel serializes the batch — the TensorCore runs
    grid steps one at a time, so b images cost b * (steps * step_time). Here the
    batch IS the sublane axis: every greedy step does its argmax / winner
    extraction / IoU / suppression for ALL images at once as (b, k) vector ops,
    and the while_loop runs max(per-image steps) instead of sum. Measured 2.6 ms
    -> sub-ms for the b16 @1280 serving NMS (profiles/r3_1280_latedecode top op).

    Per-row semantics are IDENTICAL to _nms_kernel / ops.nms._greedy_nms: rows
    whose candidates are exhausted go valid=False and become no-ops (live only
    ever decreases, so a dead row cannot revive); the loop exits when every row
    is dead or max_det winners are taken.
    """
    b, k = x1_ref.shape
    md_p = keep_idx_ref.shape[1]
    x1 = x1_ref[:]
    y1 = y1_ref[:]
    x2 = x2_ref[:]
    y2 = y2_ref[:]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
    det_lane = jax.lax.broadcasted_iota(jnp.int32, (b, md_p), 1)

    def cond(carry):
        i, live, keep_i, keep_v, any_alive = carry
        return (i < max_det) & any_alive

    def body(carry):
        i, live, keep_i, keep_v, _ = carry
        best_score = jnp.max(live, axis=1, keepdims=True)          # (b, 1)
        valid = best_score > 0.0                                   # (b, 1)
        # first lane achieving the row max (deterministic tie-break, matches
        # jnp.argmax in the lax fallback)
        best = jnp.min(jnp.where(live == best_score, lane, k),
                       axis=1, keepdims=True)                      # (b, 1)
        onehot = lane == best                                      # (b, k)

        bx1 = jnp.sum(jnp.where(onehot, x1, 0.0), axis=1, keepdims=True)
        by1 = jnp.sum(jnp.where(onehot, y1, 0.0), axis=1, keepdims=True)
        bx2 = jnp.sum(jnp.where(onehot, x2, 0.0), axis=1, keepdims=True)
        by2 = jnp.sum(jnp.where(onehot, y2, 0.0), axis=1, keepdims=True)
        barea = jnp.sum(jnp.where(onehot, area, 0.0), axis=1, keepdims=True)

        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        iou = inter / (area + barea - inter + 1e-7)

        suppress = ((iou > iou_thres) & valid) | onehot
        live = jnp.where(suppress, -1.0, live)

        write = det_lane == i                                      # (b, md_p)
        keep_i = jnp.where(write & valid, best, keep_i)
        keep_v = jnp.where(write & valid, 1, keep_v)
        return i + 1, live, keep_i, keep_v, jnp.sum(valid.astype(jnp.int32)) > 0

    _, _, keep_i, keep_v, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), scores_ref[:],
         jnp.zeros((b, md_p), jnp.int32), jnp.zeros((b, md_p), jnp.int32),
         jnp.bool_(True)),
    )
    keep_idx_ref[:] = keep_i
    keep_valid_ref[:] = keep_v


@functools.partial(jax.jit, static_argnames=("max_det", "iou_thres", "interpret"))
def pallas_batched_greedy_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_det: int = 300,
    iou_thres: float = 0.45,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over a whole batch of candidate sets in ONE kernel.

    boxes: (b, k, 4) xyxy already class-offset; scores: (b, k), invalid < 0.
    Returns (keep_idx (b, max_det) int32, keep_valid (b, max_det) bool), row-wise
    identical to ops.nms._greedy_nms / pallas_greedy_nms.
    """
    b, k = scores.shape
    pad_k = (-k) % 128          # lanes: candidates
    pad_b = (-b) % _SUBLANES    # sublanes: images (padded rows are born dead)
    if pad_k or pad_b:
        boxes = jnp.pad(boxes, ((0, pad_b), (0, pad_k), (0, 0)))
        scores = jnp.pad(scores, ((0, pad_b), (0, pad_k)), constant_values=-1.0)
    md_p = max_det + ((-max_det) % 128)
    bp = b + pad_b
    coords = boxes.astype(jnp.float32)
    scores2 = scores.astype(jnp.float32)
    keep_idx, keep_valid = pl.pallas_call(
        functools.partial(_nms_batched_kernel, max_det=max_det,
                          iou_thres=iou_thres),
        out_shape=(
            jax.ShapeDtypeStruct((bp, md_p), jnp.int32),
            jax.ShapeDtypeStruct((bp, md_p), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(coords[..., 0], coords[..., 1], coords[..., 2], coords[..., 3], scores2)
    return keep_idx[:b, :max_det], keep_valid[:b, :max_det].astype(bool)


def pallas_backend_ok() -> bool:
    """True when the compiled (non-interpret) kernel path can run."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
