"""Training step + state: the pjit-compiled SPMD train loop core.

Capability parity (reference /root/reference/skyeye/cli/train.py — the epoch loop is
truncated at :159; reconstructed per YOLOv5 convention, SURVEY.md §3.1): AMP forward,
ComputeLoss, gradient accumulation, EMA update, early stopping, fitness metric.

TPU-native redesign: a single jitted `train_step(state, batch)` carries params,
BatchNorm stats, optimizer state, and EMA as one sharded pytree. Data parallelism is
expressed by sharding the batch over the mesh's "data" axis — XLA inserts the gradient
all-reduce (psum over ICI); BatchNorm statistics are computed over the GLOBAL batch
automatically (synced-BN semantics) because the reduction is over a sharded axis.
Mixed precision = bfloat16 activations with float32 params/stats (instead of torch
AMP GradScaler — bf16 needs no loss scaling).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .ema import EMAState, ema_init, ema_update


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: EMAState
    step: jnp.ndarray  # () int32


def create_train_state(variables, tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        ema=ema_init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    module,
    loss_fn,
    tx: optax.GradientTransformation,
    ema_decay: float = 0.9999,
    device_augment: Optional[Callable] = None,
) -> Callable:
    """Build the jittable train step.

    loss_fn(predictions, targets, mask) -> (loss, aux[3]).
    Batch: dict(images=(B,H,W,C) float, targets=(B,M,6), mask=(B,M) bool) where
    targets are per-image [_, cls, x, y, w, h]; the image index column is filled here
    from the row position so host code never needs global indices.

    device_augment(images, targets, mask, key) runs INSIDE the jitted step (on-device
    mosaic/HSV/affine, data/device_aug.py); the batch then must carry an "aug_key"
    PRNG key.

    A batch may carry "n_valid" (scalar int): rows >= n_valid are wrap-around
    duplicates from the loader's fixed-shape padding and get zero loss weight
    (if the loss supports img_weight).
    """
    import inspect

    try:
        _target = loss_fn.__call__ if not inspect.isfunction(loss_fn) else loss_fn
        _loss_takes_img_weight = "img_weight" in inspect.signature(_target).parameters
    except (TypeError, ValueError):
        _loss_takes_img_weight = False

    # Normalize uint8 frames in the model's compute dtype when it is bf16:
    # u8 -> f32 -> /255 -> (bf16 at the stem conv) materializes a full-res f32
    # plane (78 MB @640 b16) the first conv immediately rounds away; a direct
    # bf16 convert+mul carries the same information (0..255 are exact in bf16,
    # the /255 result rounds ONCE instead of twice) without the intermediate.
    # Kept f32 when a device_augment runs (its HSV/affine math stays f32) or
    # when the model computes in f32 (bit-exact canonical path).
    _norm_dtype = getattr(module, "dtype", jnp.float32)
    if device_augment is not None or _norm_dtype != jnp.bfloat16:
        _norm_dtype = jnp.float32

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        images = batch["images"]
        # accept uint8 frames and normalize on device (4x cheaper H2D transfer)
        if images.dtype == jnp.uint8:
            images = images.astype(_norm_dtype) / jnp.asarray(255.0, _norm_dtype)
        n_valid = batch.get("n_valid")
        # read optional keys BEFORE `batch` is rebound below — reading them
        # later silently returns None (this exact bug shipped: opt_hyperparams
        # was read after the rebind, so runtime schedules never reached the
        # optimizer; tests/test_train.py::test_opt_hyperparams_reach_optimizer)
        opt_hp_in = batch.get("opt_hyperparams")
        dropout_key_in = batch.get("dropout_key")
        targets_in, mask_in = batch["targets"], batch["mask"]
        if device_augment is not None:
            images, targets_in, mask_in = device_augment(
                images, targets_in, mask_in, batch["aug_key"]
            )
        batch = {"images": images, "targets": targets_in, "mask": mask_in}
        B, M = batch["targets"].shape[0], batch["targets"].shape[1]
        img_idx = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.float32)[:, None], (B, M)
        )
        flat_targets = batch["targets"].reshape(B * M, 6)
        flat_targets = flat_targets.at[:, 0].set(img_idx.reshape(-1))
        flat_mask = batch["mask"].reshape(B * M)
        # wrap-around duplicates padding the last partial batch (dataset.py
        # BatchLoader) get zero loss weight — their pixels still feed BatchNorm,
        # but they contribute no gradient (ADVICE round 2)
        img_weight = None
        if n_valid is not None and _loss_takes_img_weight:
            img_weight = (jnp.arange(B) < n_valid).astype(jnp.float32)

        # stochastic layers (TransformerLayer dropout in the transformer-heads
        # variant) need a per-step PRNG; fold the step count into the batch's
        # key (or a fixed seed) so every step draws fresh masks deterministically
        dropout_rng = jax.random.fold_in(
            dropout_key_in if dropout_key_in is not None
            else jax.random.PRNGKey(0),
            state.step,
        )

        def loss_of(params):
            outs, updates = module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            if img_weight is not None:
                loss, aux = loss_fn(outs, flat_targets, flat_mask,
                                    img_weight=img_weight)
            else:
                loss, aux = loss_fn(outs, flat_targets, flat_mask)
            return loss, (aux, updates["batch_stats"])

        (loss, (aux, new_stats)), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state.params
        )
        opt_state = state.opt_state
        # runtime-scalar schedules: the host passes this step's lr/bias_lr/momentum
        # as batch scalars and the optimizer was built with inject_hyperparams
        # (build_optimizer_runtime) — overriding state.hyperparams applies them
        # without baking schedule constants into the compiled step
        hp = opt_hp_in
        if hp is not None and hasattr(opt_state, "hyperparams"):
            merged = {
                k: jnp.asarray(hp.get(k, v), jnp.float32)
                for k, v in opt_state.hyperparams.items()
            }
            opt_state = opt_state._replace(hyperparams=merged)
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = ema_update(state.ema, new_params, decay=ema_decay)

        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema=new_ema,
            step=state.step + 1,
        )
        metrics = {
            "loss": loss,
            "box": aux[0],
            "obj": aux[1],
            "cls": aux[2],
        }
        return new_state, metrics

    return step_fn


def fitness(metrics: Dict[str, float]) -> float:
    """Weighted model fitness: 0.1*mAP@50 + 0.9*mAP@50:95 (YOLOv5 convention the
    reference imports as `fitness`, train.py:38; SURVEY.md §2.7#5)."""
    return 0.1 * float(metrics.get("map50", 0.0)) + 0.9 * float(
        metrics.get("map", 0.0)
    )


class EarlyStopping:
    """Stop after `patience` epochs without fitness improvement
    (reference torch_utils.py:361-403)."""

    def __init__(self, patience: int = 30):
        self.patience = patience or float("inf")
        self.best_fitness = 0.0
        self.best_epoch = 0

    def __call__(self, epoch: int, fit: float) -> bool:
        if fit >= self.best_fitness:
            self.best_fitness = fit
            self.best_epoch = epoch
        stop = (epoch - self.best_epoch) >= self.patience
        return stop
