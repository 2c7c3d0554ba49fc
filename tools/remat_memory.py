"""What block/stage rematerialization buys at flagship training geometry.

Measures the ACTIVATION RESIDUALS a training step saves between the forward
and backward pass — the tree of arrays closed over by `jax.vjp` — for the full
skyeye_s loss at 1280px batch 2, with remat off / per-block / per-stage.
Residual bytes are the backend-independent ground truth for what
jax.checkpoint changes (XLA's CPU buffer-assignment "temp" numbers are
dominated by im2col convolution scratch that exists only on CPU, so they
cannot see remat; TPU conv lowering has no such scratch). Also reports the
FLOP overhead of the recompute from XLA cost analysis.

Usage: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/remat_memory.py
Writes profiles/remat_memory_r03.json.
"""
from __future__ import annotations

import json
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from skyeye_tpu.config import DEFAULT_HYP, ModelConfig
from skyeye_tpu.losses import ComputeLoss
from skyeye_tpu.models import SkyEyeDetectorModule

RES, B = 1280, 2


def residual_bytes(remat) -> dict:
    cfg = ModelConfig.from_variant("s", nc=10)
    module = SkyEyeDetectorModule(config=cfg, remat=remat)
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), train=True)
    loss_fn = ComputeLoss(jnp.asarray(cfg.anchors), cfg.nc)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, RES, RES, 3)).astype(np.float32))
    # flat target rows: [img_idx, cls, cx, cy, w, h] normalized (trainer.py)
    t = np.zeros((B * 32, 6), np.float32)
    m = np.zeros((B * 32,), bool)
    for b in range(B):
        for i in range(3):
            t[b * 32 + i] = [b, i, 0.3 + 0.1 * i, 0.4, 0.1, 0.15]
            m[b * 32 + i] = True
    targets, mask = jnp.asarray(t), jnp.asarray(m)

    def f(params):
        outs, _ = module.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        loss, _ = loss_fn(outs, targets, mask)
        return loss

    # jax.vjp's return is a pytree whose leaves are exactly the residuals the
    # backward pass needs; params themselves also appear — subtract them.
    _, vjp_fn = jax.vjp(f, variables["params"])
    leaves = jax.tree_util.tree_leaves(vjp_fn)
    total = sum(leaf.nbytes for leaf in leaves if hasattr(leaf, "nbytes"))
    param_bytes = sum(leaf.nbytes
                      for leaf in jax.tree_util.tree_leaves(variables["params"]))
    act = int(total - param_bytes)

    # recompute FLOP overhead (forward+backward), via XLA cost analysis
    flops = float(jax.jit(jax.grad(f)).lower(variables["params"]).compile()
                  .cost_analysis().get("flops", 0.0))
    del vjp_fn, leaves
    return {"remat": remat, "activation_residual_bytes": act, "flops": flops}


def main() -> None:
    rows = [residual_bytes(False), residual_bytes("block"),
            residual_bytes("stage")]
    base = rows[0]
    out = {
        "protocol": (f"jax.vjp residual tree of the full skyeye_s loss "
                     f"@{RES}px batch {B} (activation bytes saved fwd->bwd, "
                     "params excluded); grad FLOPs from XLA cost analysis"),
        "rows": rows,
    }
    for r in rows:
        ratio = base["activation_residual_bytes"] / max(
            r["activation_residual_bytes"], 1)
        over = (r["flops"] / base["flops"] - 1.0) * 100 if base["flops"] else 0.0
        r["residual_reduction_x"] = round(ratio, 2)
        r["flop_overhead_pct"] = round(over, 1)
        print(f"remat={r['remat']}: residuals "
              f"{r['activation_residual_bytes'] / 2**30:.2f} GiB "
              f"({ratio:.2f}x), grad flops {r['flops']:.3e} (+{over:.1f}%)")
    path = Path(__file__).resolve().parent.parent / "profiles" / \
        "remat_memory_r03.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
