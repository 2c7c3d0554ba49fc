"""Deep-stage int8 vs bf16 serving bench: stages 3-4 + neck-class shapes.

Round-3 concluded int8 loses at stages 1-2 (48-128 ch, HBM-bound: the
quantize/requant traffic beats the bandwidth it saves). VERDICT r3 missing #4
flags that conclusion as overbroad: stages 3-4 and the neck run 256-512
channels at 80/40 px where convs are MXU-bound and the v5e's 394 TF/s int8
path could plausibly engage through XLA. This measures exactly that unit.

Two units, each as ONE jitted graph timed with launches in flight
(single-op timings are relay-noise-dominated):
  deep:  P3 (B,160,160,128) -> down3 -> csp3(256,nb3) -> down4 -> csp4(512,nb1)
  neck:  the four heaviest neck convs at 256/512 ch on the 80/40 px grids
         (lateral 512->256, csp_p4-style 3x3 256ch chain, down-fuse 256->256/2,
          csp_n4-style 3x3 512ch chain)

int8 models the shipped PTQ scheme's cost structure: s8 x s8 conv ->
s32 -> f32 dequant -> SiLU -> requant s8 between every layer (static
per-tensor scales; dummies here -- only the speed question is asked).
A third variant (int8 weights, bf16 activations: w8a16) isolates whether
the activation requant chain is the loser.

Usage: python tools/quant_deep_bench.py [--batch 16] [--img 1280]
Writes profiles/int8_deep_bench.json.

Reference basis for the stage shapes: the CSP conv stacks at
/root/reference/skyeye/core/models/blocks.py:93-123 scaled per
/root/reference/skyeye/core/models/detector.py width/depth multiples.
"""
from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--out", type=Path, default=Path("profiles/int8_deep_bench.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from skyeye_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}")

    B, S = args.batch, args.img
    P3 = S // 8  # 160 @1280
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))

    def conv_bf16(x, k, stride=1, pad="SAME"):
        y = jax.lax.conv_general_dilated(
            x, k, (stride, stride), pad, dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)

    def conv_i8(x, k, stride=1, pad="SAME"):
        y = jax.lax.conv_general_dilated(
            x, k, (stride, stride), pad, dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * jnp.float32(1e-4)
        y = y * jax.nn.sigmoid(y)
        return jnp.clip(jnp.round(y * 25.0), -127, 127).astype(jnp.int8)

    def conv_w8a16(x, k, stride=1, pad="SAME"):
        # int8 weights dequantized at use; bf16 activations throughout.
        kf = k.astype(jnp.bfloat16) * jnp.bfloat16(0.01)
        y = jax.lax.conv_general_dilated(
            x, kf, (stride, stride), pad, dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)

    rng = np.random.default_rng(0)

    def mk(shape, dtype):
        if dtype == jnp.int8:
            return jnp.asarray(rng.integers(-127, 127, shape), jnp.int8)
        return jnp.asarray(rng.normal(0, 0.05, shape), jnp.bfloat16)

    def weights(dtype):
        ws = {
            "down3": mk((3, 3, 128, 256), dtype),
            "down4": mk((3, 3, 256, 512), dtype),
            # csp3: C=256 h=128 nb=3
            "c3_cv1": mk((1, 1, 256, 128), dtype),
            "c3_cv2": mk((1, 1, 256, 128), dtype),
            "c3_cv3": mk((1, 1, 256, 256), dtype),
            # csp4: C=512 h=256 nb=1
            "c4_cv1": mk((1, 1, 512, 256), dtype),
            "c4_cv2": mk((1, 1, 512, 256), dtype),
            "c4_cv3": mk((1, 1, 512, 512), dtype),
            "c4_m0_cv1": mk((1, 1, 256, 256), dtype),
            "c4_m0_cv2": mk((3, 3, 256, 256), dtype),
            # neck-class shapes
            "lat": mk((1, 1, 512, 256), dtype),
            "n_p4a": mk((3, 3, 256, 256), dtype),
            "n_p4b": mk((3, 3, 256, 256), dtype),
            "n_down": mk((3, 3, 256, 256), dtype),
            "n_c4a": mk((3, 3, 512, 512), dtype),
        }
        for i in range(3):
            ws[f"c3_m{i}_cv1"] = mk((1, 1, 128, 128), dtype)
            ws[f"c3_m{i}_cv2"] = mk((3, 3, 128, 128), dtype)
        return ws

    def csp(x, conv, pfx, nb, ws):
        y1 = conv(x, ws[f"{pfx}_cv1"])
        for i in range(nb):
            t = conv(y1, ws[f"{pfx}_m{i}_cv1"])
            t = conv(t, ws[f"{pfx}_m{i}_cv2"])
            y1 = t
        y2 = conv(x, ws[f"{pfx}_cv2"])
        return conv(jnp.concatenate([y1, y2], axis=-1), ws[f"{pfx}_cv3"])

    def deep(x, conv, ws):
        x = conv(x, ws["down3"], stride=2)
        x = csp(x, conv, "c3", 3, ws)
        x = conv(x, ws["down4"], stride=2)
        x = csp(x, conv, "c4", 1, ws)
        return x

    def neck(p4, p5, conv, ws):
        t = conv(p5, ws["lat"])                      # 40px 512->256
        t = jax.image.resize(t.astype(jnp.float32),
                             (B, P3 // 2, P3 // 2, 256), "nearest")
        t = t.astype(p4.dtype) if p4.dtype != jnp.int8 else \
            jnp.clip(jnp.round(t), -127, 127).astype(jnp.int8)
        t = conv(t, ws["n_p4a"])                     # 80px 256ch 3x3
        t = conv(t, ws["n_p4b"])
        d = conv(t, ws["n_down"], stride=2)          # 40px
        d = jnp.concatenate([d, d], axis=-1)         # 512ch stand-in for concat
        return conv(d, ws["n_c4a"])

    results = {"batch": B, "img": S}
    x_bf = jnp.asarray(rng.normal(0, 1, (B, P3, P3, 128)), jnp.bfloat16)
    x_i8 = jnp.asarray(rng.integers(-127, 127, (B, P3, P3, 128)), jnp.int8)
    p4_bf = jnp.asarray(rng.normal(0, 1, (B, P3 // 2, P3 // 2, 256)), jnp.bfloat16)
    p5_bf = jnp.asarray(rng.normal(0, 1, (B, P3 // 4, P3 // 4, 512)), jnp.bfloat16)
    p4_i8 = jnp.asarray(rng.integers(-127, 127, p4_bf.shape), jnp.int8)
    p5_i8 = jnp.asarray(rng.integers(-127, 127, p5_bf.shape), jnp.int8)

    for name, conv, wdt, xd, xn in (
        ("bf16", conv_bf16, jnp.bfloat16, x_bf, (p4_bf, p5_bf)),
        ("int8", conv_i8, jnp.int8, x_i8, (p4_i8, p5_i8)),
        ("w8a16", conv_w8a16, jnp.int8, x_bf, (p4_bf, p5_bf)),
    ):
        ws = weights(wdt)
        try:
            t_deep = bench(jax.jit(lambda x, w=ws, c=conv: deep(x, c, w)), xd)
            t_neck = bench(jax.jit(
                lambda a, b, w=ws, c=conv: neck(a, b, c, w)), *xn)
            results[f"deep_ms_{name}"] = round(t_deep, 3)
            results[f"neck_ms_{name}"] = round(t_neck, 3)
            print(f"{name:6s} deep(stages3-4) {t_deep:7.2f} ms/batch   "
                  f"neck-class {t_neck:7.2f} ms/batch")
        except Exception as e:  # Mosaic/XLA rejection must not kill the probe
            results[f"error_{name}"] = str(e)[:300]
            print(f"{name} FAILED: {str(e)[:300]}")

    if "deep_ms_int8" in results and "deep_ms_bf16" in results:
        results["deep_speedup_int8"] = round(
            results["deep_ms_bf16"] / results["deep_ms_int8"], 3)
        results["neck_speedup_int8"] = round(
            results["neck_ms_bf16"] / results["neck_ms_int8"], 3)
        print(f"int8 speedup: deep {results['deep_speedup_int8']}x, "
              f"neck {results['neck_speedup_int8']}x")
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(results, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
