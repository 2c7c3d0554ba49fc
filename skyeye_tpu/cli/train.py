"""Training CLI: full fine-tune/train loop with eval, checkpoints, early stopping.

Capability parity (reference /root/reference/skyeye/cli/train.py — file truncates at
:159; the epoch loop, checkpoint save, per-epoch validate, and early stopping are
reconstructed per YOLOv5 convention from its imports, SURVEY.md C1/§3.1): run dirs +
hyp/opt YAML dump (:61-72), seeding (:80), grad accumulation to nominal batch 64 with
weight-decay rescale (:94-96), bias/BN/weight param groups (:102-120), SGD-nesterov or
Adam (:113-116), cosine/linear schedule (:126-133), EMA (:136), resume (:139-157),
results.csv + plots, fitness-based best.pt, EarlyStopping(patience).

TPU-native redesign: one jitted train step (grads + optimizer + EMA + BN stats in a
single launch) over a ("data", "spatial") mesh — XLA inserts the ICI psum for
gradient sync; no DDP/process groups. Host threads prefetch+augment while the device
computes (double buffering via the BatchLoader queue).

Usage: python -m skyeye_tpu.cli.train --cfg skyeye_s --data drone.yaml --epochs 100 \
           --batch-size 16
"""
from __future__ import annotations

import argparse
import csv
import os
import time
from pathlib import Path
from typing import Optional

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from ..config import load_hyp
from ..utils.general import (
    LOGGER, check_dataset, check_img_size, get_latest_run, increment_path,
    init_seeds, labels_to_class_weights, print_args,
)
from ..train import (
    EarlyStopping, build_optimizer_runtime, create_train_state, fitness,
    host_schedule, make_train_step,
)
from ..train.optimizer import accumulation_steps
from ..losses import ComputeLoss
from ..utils.checkpoint import (
    flatten_leaves as flatten_opt, load_checkpoint, save_checkpoint,
)


RESULTS_HEADER = [
    "epoch", "train/box_loss", "train/obj_loss", "train/cls_loss",
    "metrics/precision", "metrics/recall", "metrics/mAP_0.5", "metrics/mAP_0.5:0.95",
    "val/box_loss", "val/obj_loss", "val/cls_loss", "lr",
]


def train(
    cfg="skyeye_s",
    data: str = "",
    hyp: Optional[str] = None,
    epochs: int = 100,
    batch_size: int = 16,
    img_size: int = 640,
    weights: str = "",
    resume: bool = False,
    adam: bool = False,
    linear_lr: bool = False,
    max_labels: int = 300,
    workers: int = 4,
    project: str = "runs/train",
    name: str = "exp",
    exist_ok: bool = False,
    patience: int = 30,
    seed: int = 0,
    save_period: int = -1,
    noval: bool = False,
    cache_images: bool = False,
    half: bool = False,
    spatial_shards: int = 1,
    device_aug: bool = False,
    accumulate: int = 0,
    autoanchor: bool = False,
    evolve: int = 0,
    debug_nans: bool = False,
    ref_exact_cross_attn: Optional[bool] = None,
    remat: str = "",  # "" = off, "block" | "stage" (see models.backbone)
    fsdp: bool = False,
    packed_stem: bool = True,
):
    from ..data.dataset import create_dataloader
    from ..parallel import create_mesh, shard_batch
    from .validate import validate

    if evolve:
        # hyperparameter evolution: short runs, fitness-selected (train.py --evolve)
        from ..train.evolve import evolve as run_evolve

        base_hyp = load_hyp(hyp)
        kwargs = dict(
            cfg=cfg, data=data, epochs=epochs, batch_size=batch_size,
            img_size=img_size, weights=weights, adam=adam, linear_lr=linear_lr,
            max_labels=max_labels, workers=workers, project=project,
            patience=patience, seed=seed, cache_images=cache_images, half=half,
            spatial_shards=spatial_shards, device_aug=device_aug,
            accumulate=accumulate, packed_stem=packed_stem,
        )

        def short_train(cand_hyp):
            import tempfile

            with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
                yaml.safe_dump(cand_hyp, f)
            res, _ = train(hyp=f.name, name="evolve_gen", exist_ok=True, **kwargs)
            return 0.1 * res[2] + 0.9 * res[3]

        best = run_evolve(short_train, base_hyp, generations=evolve,
                          save_dir=Path(project) / "evolve", seed=seed)
        (Path(project) / "evolve" / "hyp_evolved.yaml").write_text(yaml.safe_dump(best))
        return None, Path(project) / "evolve"

    # -- run dir + config dump (train.py:61-72)
    save_dir = increment_path(Path(project) / name, exist_ok=exist_ok or resume, mkdir=True)
    wdir = save_dir / "weights"
    wdir.mkdir(parents=True, exist_ok=True)
    hyp_dict = load_hyp(hyp)
    (save_dir / "hyp.yaml").write_text(yaml.safe_dump(hyp_dict))
    opt_dump = {k: v for k, v in locals().items()
                if isinstance(v, (int, float, str, bool))}
    (save_dir / "opt.yaml").write_text(yaml.safe_dump(opt_dump))
    print_args(opt_dump)

    if debug_nans:
        # JAX-native numerical sanitizer: abort with a traceback at the first NaN
        # (the framework's analogue of torch anomaly detection; SURVEY.md §5.2)
        jax.config.update("jax_debug_nans", True)

    init_seeds(seed)
    data_cfg = check_dataset(data)
    nc = data_cfg.nc

    # -- model
    from ..models.detector import create_detector

    dtype = jnp.bfloat16 if half else jnp.float32
    # packed-stem training (ops/packed_stem_train.py): stem+down1 run in the
    # s2d4 input domain with CANONICAL params — numerically equivalent, same
    # checkpoint tree, measured +9% step throughput @640 b16 (the raw 6x6/2
    # stem conv runs at 3/128-lane occupancy; profiles/ab_packed_train.json).
    # Auto-disabled under spatial sharding: the host loader packs H/4 frames,
    # which the spatial-axis row partitioning has not been validated against.
    if packed_stem and spatial_shards > 1:
        LOGGER.info("packed-stem training disabled (untested with --spatial-shards)")
        packed_stem = False
    module, variables = create_detector(cfg, num_classes=nc, dtype=dtype,
                                        rng=jax.random.PRNGKey(seed),
                                        ref_exact_cross_attn=ref_exact_cross_attn,
                                        remat=remat, packed_stem_train=packed_stem)
    config = module.config
    stride = int(max(config.strides))
    img_size = check_img_size(img_size, stride)

    if weights:
        from ..utils.checkpoint import load_torch_checkpoint, merge_matching

        if str(weights).endswith((".pt", ".pth")):
            conv = load_torch_checkpoint(weights)
            params, n_l, n_t = merge_matching(variables["params"], conv["params"])
            stats, _, _ = merge_matching(variables["batch_stats"], conv["batch_stats"])
            variables = {"params": params, "batch_stats": stats}
            LOGGER.info("transferred %d/%d params from %s", n_l, n_t, weights)
        else:
            ckpt = load_checkpoint(weights)
            from ..utils.checkpoint import merge_matching

            params, n_l, n_t = merge_matching(
                variables["params"], ckpt.get("ema_params") or ckpt.get("params")
            )
            stats, _, _ = merge_matching(variables["batch_stats"], ckpt.get("batch_stats", {}))
            variables = {"params": params, "batch_stats": stats}
            LOGGER.info("transferred %d/%d params from %s", n_l, n_t, weights)

    # -- data: with on-device aug the host loader only letterboxes (augment=False);
    # mosaic/affine/HSV/flips run inside the jitted train step on the accelerator
    train_loader, train_ds = create_dataloader(
        data_cfg.train, img_size=img_size, batch_size=batch_size, stride=stride,
        augment=not device_aug, hyp=hyp_dict, workers=workers, max_labels=max_labels,
        cache_images=cache_images, seed=seed, shuffle=True,
    )
    steps_per_epoch = len(train_loader)
    class_weights = labels_to_class_weights(train_ds.labels, nc)

    if autoanchor:
        from ..utils.autoanchor import check_anchors, fit_anchors_for_dataset
        import dataclasses

        whs = [l[:, 3:5] * np.array(s_) * (img_size / max(s_))
               for l, s_ in zip(train_ds.labels, train_ds.shapes) if len(l)]
        if whs:
            wh_px = np.concatenate(whs, 0)
            bpr = check_anchors(wh_px, config.anchors, config.strides, img_size)
            if bpr < 0.98:
                LOGGER.info("refitting anchors (best-possible recall %.3f < 0.98)", bpr)
                new_anchors = fit_anchors_for_dataset(train_ds, img_size,
                                                      config.strides)
                config = dataclasses.replace(config, anchors=new_anchors)
                module, variables = create_detector(
                    config, dtype=dtype, rng=jax.random.PRNGKey(seed),
                    ref_exact_cross_attn=ref_exact_cross_attn, remat=remat,
                    packed_stem_train=packed_stem)
    LOGGER.info("train: %d images, %d steps/epoch", len(train_ds), steps_per_epoch)

    # -- optimizer + schedules (train.py:94-133)
    accumulate = accumulate or accumulation_steps(batch_size)
    # optax.MultiSteps advances the schedule count once per `accumulate` micro-steps,
    # so every schedule must be denominated in OPTIMIZER steps, not loader batches
    opt_steps_per_epoch = max(steps_per_epoch // accumulate, 1)
    warmup_steps = max(
        int(round(hyp_dict.get("warmup_epochs", 3.0) * steps_per_epoch)), 100
    )
    warmup_opt_steps = max(warmup_steps // accumulate, 1)
    # runtime-scalar schedules: the host computes this step's lr/bias_lr/momentum
    # as plain floats and passes them into the jitted step — changing --epochs or
    # any hyp no longer forces a recompile (each closed-over schedule constant used
    # to cost a fresh 10-15 min remote compile)
    lr_sched = host_schedule(hyp_dict, epochs, opt_steps_per_epoch,
                             cos_lr=not linear_lr, warmup_steps=warmup_opt_steps)
    tx = build_optimizer_runtime(hyp_dict, variables["params"], adam=adam,
                                 batch_size=batch_size, accumulate=accumulate)

    # SKYEYE_DENSE_LOSS=1 opts into the dense-cotangent loss formulation
    # (losses/detection.py::_level_dense): identical values/gradients for
    # collision-free assignments, weighted-mean targets on the rare
    # (image, anchor, cell) collision; exact gather path is the default.
    loss_fn = ComputeLoss(jnp.asarray(config.anchors), nc, hyp=hyp_dict,
                          dense=bool(os.environ.get("SKYEYE_DENSE_LOSS")))
    state = create_train_state(variables, tx)
    start_epoch, best_fit = 0, 0.0

    # -- resume (train.py:139-157)
    if resume:
        last = get_latest_run(project) or str(wdir / "last")
        if Path(last).exists():
            ckpt = load_checkpoint(last)
            from ..utils.checkpoint import merge_matching, unflatten_like

            params, _, _ = merge_matching(state.params, ckpt["params"])
            stats, _, _ = merge_matching(state.batch_stats, ckpt.get("batch_stats", {}))
            ema_p, _, _ = merge_matching(state.ema.params, ckpt.get("ema_params", ckpt["params"]))
            state = state._replace(
                params=params, batch_stats=stats,
                ema=state.ema._replace(
                    params=ema_p,
                    updates=jnp.asarray(ckpt.get("ema_updates", 0), jnp.int32),
                ),
                step=jnp.asarray(ckpt.get("step", 0), jnp.int32),
            )
            # exact resume: restore momentum/Adam moments + MultiSteps counter;
            # a structure/shape mismatch (optimizer config changed) falls back to
            # the fresh opt_state with a warning
            if ckpt.get("opt_state"):
                try:
                    state = state._replace(
                        opt_state=unflatten_like(state.opt_state, ckpt["opt_state"])
                    )
                except ValueError as e:
                    LOGGER.warning("could not restore optimizer state (%s); "
                                   "momenta restart from zero", e)
            start_epoch = int(ckpt.get("epoch", -1)) + 1
            best_fit = float(ckpt.get("best_fitness", 0.0))
            LOGGER.info("resumed from %s at epoch %d", last, start_epoch)

    # -- mesh + sharded step
    n_dev = len(jax.devices())
    # the data axis must divide the batch; use the largest batch divisor that
    # fits the devices (e.g. batch 4 on an 8-device host -> data=4 mesh)
    avail = max(n_dev // max(spatial_shards, 1), 1)
    n_data = max(d for d in range(1, min(avail, batch_size) + 1)
                 if batch_size % d == 0)
    mesh = (create_mesh(n_data=n_data, n_spatial=spatial_shards)
            if n_data * spatial_shards > 1 else None)
    aug_fn = None
    if device_aug:
        from functools import partial as _partial

        from ..data.device_aug import augment_batch_device

        aug_fn = _partial(augment_batch_device, hyp=hyp_dict,
                          use_mosaic=hyp_dict.get("mosaic", 1.0) > 0)
    raw_step = make_train_step(module, loss_fn, tx, device_augment=aug_fn)
    if fsdp and mesh is not None and n_data > 1:
        # ZeRO/FSDP: params/opt/EMA live sharded over the data axis; XLA
        # all-gathers weights just-in-time and reduce-scatters gradients
        # (parallel/fsdp.py). ~n_data x less state memory per device.
        from ..parallel import jit_fsdp_step, shard_train_state

        state = shard_train_state(mesh, state)
        step_fn = jit_fsdp_step(raw_step, mesh, state)
        LOGGER.info("FSDP: training state sharded over data axis (%d-way)", n_data)
    else:
        step_fn = jax.jit(raw_step)
    stopper = EarlyStopping(patience=patience)
    results_file = save_dir / "results.csv"
    if not results_file.exists():
        with open(results_file, "w", newline="") as f:
            csv.writer(f).writerow(RESULTS_HEADER)

    LOGGER.info("starting training for %d epochs (accumulate=%d, devices=%d)",
                epochs, accumulate, n_dev)
    from ..data.prefetch import device_prefetch

    # with host aug the loader's frames are packed HOST-side (a free transpose
    # next to the copy below; on-device packing costs a real transpose — the
    # measured gap is 495.6 host vs 468.7 device img/s @640 b16). The device-aug
    # path needs raw frames (the aug gather outputs them) — there the model's
    # raw-input branch packs on device.
    pack_host = packed_stem and aug_fn is None
    if pack_host:
        from ..ops.packed_stem import s2d4_host

    def to_host_batch(batch):
        """Keep images uint8 (4x cheaper H2D); normalize inside the jitted step."""
        out = {
            "images": np.ascontiguousarray(
                s2d4_host(batch["images"]) if pack_host else batch["images"]),
            "targets": np.asarray(batch["targets"]),
            "mask": np.asarray(batch["mask"]),
            # rows >= n_valid are wrap-around duplicates (fixed-shape padding of
            # the last partial batch) — the train step zeroes their loss weight
            "n_valid": np.asarray(batch.get("n_valid", batch["images"].shape[0]),
                                  np.int32),
        }
        return shard_batch(mesh, out) if mesh is not None else out

    final_results = (0, 0, 0, 0, 0, 0, 0)
    py_step = int(state.step)
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        # device-prefetched batches + deferred metric fetches: the epoch loop never
        # blocks on the device except once at the end
        metric_handles = []
        nb = 0
        for dev_batch in device_prefetch(train_loader, size=2, transform=to_host_batch):
            if aug_fn is not None:
                dev_batch["aug_key"] = jax.random.PRNGKey(seed * 1_000_003 + py_step)
            sched_now = lr_sched(py_step // accumulate)
            dev_batch["opt_hyperparams"] = {
                k: np.float32(v) for k, v in sched_now.items()
            }
            state, metrics = step_fn(state, dev_batch)
            metric_handles.append(metrics)
            py_step += 1
            nb += 1
        mloss = np.mean(
            [[float(m["box"]), float(m["obj"]), float(m["cls"])] for m in metric_handles],
            axis=0,
        ) if metric_handles else np.zeros(3)
        lr_now = lr_sched(py_step // accumulate)["lr"]  # schedule count = optimizer steps
        LOGGER.info("epoch %d/%d: box %.4f obj %.4f cls %.4f (%.1fs, lr %.5f)",
                    epoch + 1, epochs, *mloss, time.time() - t0, lr_now)

        # -- per-epoch eval on EMA weights (YOLOv5 convention)
        results = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
        if not noval and data_cfg.val:
            eval_vars = {"params": state.ema.params, "batch_stats": state.batch_stats}
            results, _, _ = validate(
                data_cfg, batch_size=batch_size, img_size=img_size,
                model=(module, eval_vars, config), plots=False,
                save_dir=save_dir, compute_loss=loss_fn,
            )
        fit = fitness({"map50": results[2], "map": results[3]})
        best_fit = max(best_fit, fit)
        final_results = results

        with open(results_file, "a", newline="") as f:
            csv.writer(f).writerow(
                [epoch, *mloss, *results[:4], *results[4:7], lr_now]
            )

        # -- checkpoints (train.py:139-157 convention: last + best by fitness).
        # With --noval the fitness signal doesn't exist, so "best" is skipped and
        # --save-period N thins `last` to every N epochs (+ the final one) — an
        # orbax save costs seconds, which dominates short-epoch runs otherwise.
        ckpt_every = save_period if (noval and save_period > 0) else 1
        save_now = (epoch % ckpt_every == 0) or (epoch == epochs - 1)
        if save_now:
            payload = {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "ema_params": state.ema.params,
                "ema_updates": int(state.ema.updates),
                # full optimizer state in last/ for exact resume (reference keeps
                # the optimizer in last.pt and strips it from final weights,
                # train.py:139-157); flattened because optax states are
                # NamedTuples orbax round-trips as dicts
                "opt_state": flatten_opt(state.opt_state),
                "step": int(state.step),
                "epoch": epoch,
                "best_fitness": best_fit,
                "config": config.to_dict(),
            }
            save_checkpoint(wdir / "last", payload)
            if fit >= best_fit and not noval:
                save_checkpoint(wdir / "best", payload)
            if save_period > 0 and not noval and epoch % save_period == 0:
                save_checkpoint(wdir / f"epoch{epoch}", payload)

        if stopper(epoch, fit):
            LOGGER.info("early stopping at epoch %d (no improvement for %d epochs)",
                        epoch + 1, patience)
            break

    # -- final: plots + strip
    try:
        from ..utils.visualization import plot_results

        plot_results(results_file)
    except Exception as e:
        LOGGER.warning("plot_results failed: %s", e)
    LOGGER.info("training complete; best fitness %.4f; weights in %s", best_fit, wdir)
    return final_results, save_dir


def parse_opt():
    p = argparse.ArgumentParser(description="SkyEye-TPU training")
    p.add_argument("--cfg", "--config", type=str, default="skyeye_s")
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--hyp", type=str, default=None)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--img-size", "--imgsz", type=int, default=640)
    p.add_argument("--weights", type=str, default="", help="initial weights (.pt or ckpt dir)")
    p.add_argument("--resume", nargs="?", const=True, default=False)
    p.add_argument("--adam", action="store_true")
    p.add_argument("--linear-lr", action="store_true")
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--project", default="runs/train")
    p.add_argument("--name", default="exp")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--patience", type=int, default=30)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-period", type=int, default=-1)
    p.add_argument("--noval", action="store_true")
    p.add_argument("--cache-images", action="store_true")
    p.add_argument("--half", action="store_true", help="bfloat16 activations")
    p.add_argument("--spatial-shards", type=int, default=1,
                   help="shard image rows over this many mesh devices (GSPMD halo)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-shard params/optimizer/EMA over the data axis "
                        "(~N_data x less training-state memory per device; XLA "
                        "all-gathers weights just-in-time over ICI)")
    p.add_argument("--debug-nans", action="store_true",
                   help="abort with a traceback at the first NaN (jax_debug_nans)")
    p.add_argument("--evolve", type=int, nargs="?", const=10, default=0,
                   help="evolve hyperparameters for N generations")
    p.add_argument("--autoanchor", action="store_true",
                   help="check and refit anchors to the dataset (kmeans)")
    p.add_argument("--accumulate", type=int, default=0,
                   help="gradient accumulation steps (0 = auto to nominal batch 64)")
    p.add_argument("--device-aug", action="store_true",
                   help="run mosaic/HSV/affine augmentation on-device inside the "
                        "jitted train step instead of in host workers")
    p.add_argument("--max-labels", type=int, default=300)
    p.add_argument("--no-packed-stem", dest="packed_stem", action="store_false",
                   help="disable s2d4 packed-stem training (ops/packed_stem_train"
                        ".py; numerically equivalent, ~9%% faster step — default on)")
    p.add_argument("--remat", nargs="?", const="stage", default="",
                   choices=("block", "stage"),
                   help="rematerialize activations in the backward pass "
                        "(jax.checkpoint): 'stage' (default when bare) saves "
                        "only pyramid-boundary tensors — a large cut in "
                        "activation memory for ~1 extra forward of FLOPs; "
                        "'block' checkpoints individual CSP/SPP blocks")
    return p.parse_args()


def main():
    opt = parse_opt()
    train(**{k: v for k, v in vars(opt).items()})


if __name__ == "__main__":
    main()
