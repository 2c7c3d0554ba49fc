"""A/B the train-mode packed stem on chip (bench --config train640 protocol).

Three arms, same step/optimizer/loss, bf16 activations, 640px b16:
  canonical      — raw (B, 640, 640, 3) images, canonical stem (shipped today)
  packed-host    — s2d4-packed (B, 160, 160, 48) images (host/loader packs)
  packed-device  — raw images, the model packs on device (the transpose the
                   device-aug path would pay until the aug gather composes it)

Writes profiles/ab_packed_train.json.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(batch: int = 16, steps: int = 24) -> None:
    import jax
    import jax.numpy as jnp

    from skyeye_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from skyeye_tpu.config import DEFAULT_HYP, ModelConfig
    from skyeye_tpu.losses import ComputeLoss
    from skyeye_tpu.models import SkyEyeDetectorModule
    from skyeye_tpu.ops.packed_stem import s2d4_host
    from skyeye_tpu.train import (
        build_optimizer_runtime, create_train_state, host_schedule,
        make_train_step,
    )

    cfg = ModelConfig.from_variant("s", nc=10)
    loss_fn = ComputeLoss(jnp.asarray(cfg.anchors), cfg.nc)
    sched = host_schedule(DEFAULT_HYP, epochs=100, steps_per_epoch=100)

    rng = np.random.default_rng(0)
    images_np = rng.uniform(0, 1, (batch, 640, 640, 3)).astype(np.float32)
    targets = np.zeros((batch, 32, 6), np.float32)
    mask = np.zeros((batch, 32), bool)
    for b in range(batch):
        for t in range(8):
            targets[b, t] = [0, rng.integers(0, 10), rng.uniform(0.2, 0.8),
                             rng.uniform(0.2, 0.8), rng.uniform(0.05, 0.2),
                             rng.uniform(0.05, 0.2)]
            mask[b, t] = True
    base_batch = {
        "targets": jnp.asarray(targets), "mask": jnp.asarray(mask),
        "n_valid": jnp.asarray(batch, jnp.int32),
        "opt_hyperparams": {k: jnp.float32(v) for k, v in sched(0).items()},
    }

    def run_one(packed: bool, host_pack: bool):
        module = SkyEyeDetectorModule(config=cfg, dtype=jnp.bfloat16,
                                      packed_stem_train=packed)
        variables = module.init(jax.random.PRNGKey(0),
                                jnp.zeros((2, 640, 640, 3)), train=True)
        tx = build_optimizer_runtime(DEFAULT_HYP, variables["params"],
                                     batch_size=batch)
        state = create_train_state(variables, tx)
        step = jax.jit(make_train_step(module, loss_fn, tx))
        imgs = s2d4_host(images_np) if host_pack else images_np
        batch_d = dict(base_batch, images=jnp.asarray(imgs))
        t0 = time.time()
        state, m0 = step(state, batch_d)
        jax.block_until_ready(state.params)
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        metrics = None
        for _ in range(steps):
            state, metrics = step(state, batch_d)
        jax.block_until_ready(state.params)
        dt = (time.perf_counter() - t0) / steps
        assert np.isfinite(float(metrics["loss"]))
        return {"images_per_s": round(batch / dt, 1),
                "ms_per_step": round(dt * 1000, 2),
                "loss_step0": round(float(m0["loss"]), 4),
                "compile_s": round(compile_s, 1)}

    out = {}
    for name, (packed, host_pack) in {
        "canonical": (False, False),
        "packed_host": (True, True),
        "packed_device": (True, False),
    }.items():
        out[name] = run_one(packed, host_pack)
        print(f"# {name}: {out[name]}", flush=True)

    out["loss_match"] = abs(out["canonical"]["loss_step0"]
                            - out["packed_host"]["loss_step0"]) < 5e-3
    path = Path(__file__).parent.parent / "profiles" / "ab_packed_train.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
