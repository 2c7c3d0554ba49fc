"""Stage-level int8 vs bf16 serving bench: the real early-backbone graph.

quant_probe's single-op timings are unreliable through the axon relay (dispatch
noise ~ kernel time), so this measures the decision-relevant unit instead: the
entire early backbone (packed stem -> csp1 -> down2 -> csp2) as ONE jitted
graph, bf16 vs int8 (s8 conv -> s32 -> dequant f32 -> SiLU -> requant s8),
timed bench-style with 16 launches in flight.

The int8 variant models static per-tensor activation scales (PTQ) — scales are
dummies here; only the speed question is answered. If int8 wins, the shipped
path gets real calibrated scales (tools/calibrate_int8.py).

Usage: python tools/quant_stage_bench.py [--batch 16] [--img 1280]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def bench(fn, *args, iters=16, warmup=2):
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, default=1280)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from skyeye_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}")

    B, S = args.batch, args.img
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))

    def conv_bf16(x, k, stride=1, pad="SAME"):
        y = jax.lax.conv_general_dilated(
            x, k, (stride, stride), pad, dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)

    def conv_i8(x, k, stride=1, pad="SAME", requant=True):
        y = jax.lax.conv_general_dilated(
            x, k, (stride, stride), pad, dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * jnp.float32(1e-4)
        y = y * jax.nn.sigmoid(y)
        if requant:
            return jnp.clip(jnp.round(y * 25.0), -127, 127).astype(jnp.int8)
        return y.astype(jnp.bfloat16)

    # skyeye_s channel plan: c1=32(stem out 64 via packed), csp1 64ch nb=1,
    # down2 64->128 /2, csp2 128ch nb=3
    def csp(x, conv, C, h, nb, ws):
        y1 = conv(x, ws[f"cv1_{C}"])
        for i in range(nb):
            t = conv(y1, ws[f"m{i}_cv1_{h}"])
            t = conv(t, ws[f"m{i}_cv2_{h}"])
            y1 = y1 + t if t.dtype == y1.dtype else t
        y2 = conv(x, ws[f"cv2_{C}"])
        y = jnp.concatenate([y1, y2], axis=-1)
        return conv(y, ws[f"cv3_{C}"])

    rng = np.random.default_rng(0)

    def weights(dtype):
        def mk(shape):
            if dtype == jnp.int8:
                return jnp.asarray(rng.integers(-127, 127, shape), jnp.int8)
            return jnp.asarray(rng.normal(0, 0.05, shape), jnp.bfloat16)
        ws = {
            "stem": mk((3, 3, 48, 128)),
            "down1": mk((2, 2, 128, 64)),
            "down2": mk((3, 3, 64, 128)),
            # csp1: C=64, h=32
            "cv1_64": mk((1, 1, 64, 32)), "cv2_64": mk((1, 1, 64, 32)),
            "cv3_64": mk((1, 1, 64, 64)),
            "m0_cv1_32": mk((1, 1, 32, 32)), "m0_cv2_32": mk((3, 3, 32, 32)),
            # csp2: C=128, h=64
            "cv1_128": mk((1, 1, 128, 64)), "cv2_128": mk((1, 1, 128, 64)),
            "cv3_128": mk((1, 1, 128, 128)),
        }
        for i in range(3):
            ws[f"m{i}_cv1_64"] = mk((1, 1, 64, 64))
            ws[f"m{i}_cv2_64"] = mk((3, 3, 64, 64))
        return ws

    def stage_bf16(xp, ws):
        x = conv_bf16(xp, ws["stem"])                       # (B,S/4,S/4,128)
        x = conv_bf16(x, ws["down1"], pad=[(1, 0), (1, 0)])  # -> 64ch
        x = csp(x, conv_bf16, 64, 32, 1, ws)
        x = conv_bf16(x, ws["down2"], stride=2)             # (B,S/8,S/8,128)
        x = csp(x, conv_bf16, 128, 64, 3, ws)
        return x

    def stage_i8(xp, ws):
        x = conv_i8(xp, ws["stem"])
        x = conv_i8(x, ws["down1"], pad=[(1, 0), (1, 0)])
        x = csp(x, conv_i8, 64, 32, 1, ws)
        x = conv_i8(x, ws["down2"], stride=2)
        x = csp(x, lambda a, k, **kw: conv_i8(a, k, **kw), 128, 64, 3, ws)
        return x

    xp_bf = jnp.asarray(
        rng.integers(0, 255, (B, S // 4, S // 4, 48)), jnp.uint8
    ).astype(jnp.bfloat16) / 255.0
    xp_i8 = jnp.asarray(rng.integers(-127, 127, (B, S // 4, S // 4, 48)), jnp.int8)

    ws_bf = weights(jnp.bfloat16)
    ws_i8 = weights(jnp.int8)

    f_bf = jax.jit(lambda x: stage_bf16(x, ws_bf))
    f_i8 = jax.jit(lambda x: stage_i8(x, ws_i8))

    t_bf = bench(f_bf, xp_bf)
    print(f"early backbone (stem->csp2) bf16 @{S} b{B}: {t_bf:.2f} ms/batch")
    try:
        t_i8 = bench(f_i8, xp_i8)
        print(f"early backbone (stem->csp2) int8 @{S} b{B}: {t_i8:.2f} ms/batch "
              f"({t_bf / t_i8:.2f}x)")
    except Exception as e:
        print(f"int8 stage FAILED: {str(e)[:400]}")


if __name__ == "__main__":
    main()
