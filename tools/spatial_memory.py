"""What spatial sharding buys at flagship geometry (VERDICT r2 weak #6).

AOT-compiles the FULL skyeye_s training step at 1280px (global batch 2 — the
small-batch/high-res fine-tune regime where data parallelism alone strands
devices) on an 8-virtual-device CPU backend under two meshes and reports XLA's
per-device memory analysis:

  * (data=2)            — 1 full 1280px image per busy device, 6 devices idle
  * (data=2, spatial=4) — image rows sharded 4-way: all 8 devices busy, each
                          holding ~1/4 of the activation rows

The CNN activation footprint is dominated by the early high-res stages (which
the spatial axis shards and the <4-rows guard never touches at this geometry:
P5 = 40 rows -> 10/shard), so per-device temp memory should drop ~linearly with
the spatial factor. That is the capability spatial sharding adds: training at
resolutions/batch sizes where a single chip's HBM cannot hold one image's
activations. Compile-only (no execution) — XLA's buffer assignment is the
ground truth for per-device memory, and it is identical on CPU and TPU up to
layout padding.

Usage: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/spatial_memory.py
Writes profiles/spatial_memory_r03.json.
"""
from __future__ import annotations

import json
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

from skyeye_tpu.config import DEFAULT_HYP, ModelConfig
from skyeye_tpu.losses import ComputeLoss
from skyeye_tpu.models import SkyEyeDetectorModule
from skyeye_tpu.parallel import batch_sharding, create_mesh, replicated
from skyeye_tpu.train import (
    build_optimizer_runtime, create_train_state, host_schedule, make_train_step,
)

RES, B = 1280, 2


def compile_step(n_data: int, n_spatial: int) -> dict:
    n_dev = n_data * n_spatial
    mesh = create_mesh(n_data=n_data, n_spatial=n_spatial,
                       devices=jax.devices()[:n_dev])
    cfg = ModelConfig.from_variant("s", nc=10)
    module = SkyEyeDetectorModule(config=cfg)
    variables = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, RES, RES, 3)), train=True)
    )
    loss_fn = ComputeLoss(jnp.asarray(cfg.anchors), cfg.nc)
    tx = build_optimizer_runtime(DEFAULT_HYP, variables["params"], batch_size=B)
    state = jax.eval_shape(lambda v: create_train_state(v, tx), variables)
    step = make_train_step(module, loss_fn, tx)

    img_sh = batch_sharding(mesh, spatial_dim=1)
    flat_sh = batch_sharding(mesh)
    rep = replicated(mesh)
    sched = host_schedule(DEFAULT_HYP, epochs=10, steps_per_epoch=10)
    batch = {
        "images": jax.ShapeDtypeStruct((B, RES, RES, 3), jnp.float32,
                                       sharding=img_sh),
        "targets": jax.ShapeDtypeStruct((B, 32, 6), jnp.float32,
                                        sharding=flat_sh),
        "mask": jax.ShapeDtypeStruct((B, 32), jnp.bool_, sharding=flat_sh),
        "n_valid": jax.ShapeDtypeStruct((), jnp.int32, sharding=rep),
        "opt_hyperparams": {
            k: jax.ShapeDtypeStruct((), jnp.float32, sharding=rep)
            for k in sched(0)
        },
    }
    state = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep), state)

    with jax.set_mesh(mesh):
        compiled = jax.jit(step).lower(state, batch).compile()
    ma = compiled.memory_analysis()
    return {
        "mesh": {"data": n_data, "spatial": n_spatial},
        "devices_busy": n_dev,
        "temp_bytes_per_device": int(ma.temp_size_in_bytes),
        "argument_bytes_per_device": int(ma.argument_size_in_bytes),
        "output_bytes_per_device": int(ma.output_size_in_bytes),
    }


def main() -> None:
    rows = [compile_step(2, 1), compile_step(2, 4)]
    ratio = rows[0]["temp_bytes_per_device"] / max(
        rows[1]["temp_bytes_per_device"], 1)
    out = {
        "protocol": (f"AOT-compile full skyeye_s train step @{RES}px global "
                     f"batch {B}; XLA buffer-assignment memory analysis "
                     "(per-device), 8 virtual CPU devices"),
        "rows": rows,
        "temp_memory_reduction_x": round(ratio, 2),
    }
    for r in rows:
        print(f"mesh {r['mesh']}: temp/device "
              f"{r['temp_bytes_per_device'] / 2**30:.2f} GiB, "
              f"args {r['argument_bytes_per_device'] / 2**30:.2f} GiB")
    print(f"spatial=4 cuts per-device activation temp {ratio:.2f}x")
    path = Path(__file__).resolve().parent.parent / "profiles" / \
        "spatial_memory_r03.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
