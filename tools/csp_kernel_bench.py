"""Standalone fused-CSP kernel timings on chip: XLA canonical vs Pallas v1 vs v2.

Shapes are the skyeye_s @1280 serving stages (the round-2 profile's HBM-bound
hot spots). Run after editing ops/pallas/csp_kernel.py to see whether the fused
kernel earns its place in the pipeline (round-2 VERDICT #1).

Usage: python tools/csp_kernel_bench.py [--stages csp1,csp2]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def bench(fn, *args, iters=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="csp1,csp2")
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from functools import partial

    from skyeye_tpu.models.blocks import CSPBlock
    from skyeye_tpu.ops.fused_csp import fuse_csp_variables
    from skyeye_tpu.ops.pallas.csp_kernel import csp_fused, csp_fused_v2
    from skyeye_tpu.utils.cache import enable_compilation_cache
    from skyeye_tpu.utils.checkpoint import fuse_conv_bn

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}")

    # skyeye_s @1280: csp1 (B, 320, 320, 64) nb=1, csp2 (B, 160, 160, 128) nb=3
    stages = {
        "csp1": dict(C=64, H=320, nb=1),
        "csp2": dict(C=128, H=160, nb=3),
    }
    B = args.batch
    for name in args.stages.split(","):
        st = stages[name]
        C, H, nb = st["C"], st["H"], st["nb"]
        key = jax.random.PRNGKey(0)
        m = CSPBlock(C, nb, dtype=jnp.bfloat16)
        x = jax.random.normal(key, (B, H, H, C), jnp.float32)
        v = m.init(key, x[:1], train=False)
        leaves, treedef = jtu.tree_flatten(v)
        rngs = jax.random.split(key, len(leaves))
        v = jtu.tree_unflatten(
            treedef,
            [l + 0.1 * jax.random.normal(r, l.shape) for l, r in zip(leaves, rngs)],
        )
        v = jtu.tree_map(lambda l: jnp.abs(l) + 0.05 if l.ndim == 1 else l, v)
        vf = fuse_conv_bn(v)
        wrapped = {"params": {"backbone": {"csp1": vf["params"]}},
                   "batch_stats": {"backbone": {"csp1": vf["batch_stats"]}}}
        weights = fuse_csp_variables(wrapped)["params"]["backbone"]["csp1"]
        xb = x.astype(jnp.bfloat16)

        xla = jax.jit(lambda xx: m.apply(vf, xx, train=False))
        t_xla = bench(xla, xb)
        print(f"{name} ({B}x{H}x{H}x{C}, nb={nb}): XLA {t_xla:.2f} ms")

        ref = np.asarray(xla(xb), np.float32)
        for label, fn in [
            ("pallas v1", partial(csp_fused, num_blocks=nb, tile_rows=32)),
            ("pallas v2", partial(csp_fused_v2, num_blocks=nb, tile_rows=32)),
        ]:
            try:
                got = np.asarray(fn(xb, weights), np.float32)
                err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
                t = bench(lambda xx: fn(xx, weights), xb)
                print(f"  {label}: {t:.2f} ms ({t_xla / t:.2f}x vs XLA, "
                      f"rel err {err:.1e})")
            except Exception as e:
                print(f"  {label}: FAILED {str(e)[:400]}")


if __name__ == "__main__":
    main()
