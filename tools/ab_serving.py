"""Quick on-chip A/B of serving-path experiments (env-flag gated variants).

Builds the bench serving body at the flagship geometry and times N pipelined
rounds per variant, printing img/s. Variants are (label, env-dict) pairs; the
model is rebuilt per variant so the flags take effect at trace time.

Usage: python tools/ab_serving.py [--img 1280] [--batch 16] \
           [--variants base,barrier,shiftmax,both]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

_FLAGS = ("SKYEYE_STEM_BARRIER", "SKYEYE_NO_STEM_BARRIER",
          "SKYEYE_SPP_SHIFTMAX", "SKYEYE_NO_PACKED_M", "SKYEYE_PACKED_M",
          "SKYEYE_STEM_BF16_MATERIALIZE", "SKYEYE_SPATTN_SHIFTADD",
          "SKYEYE_INT8_STEM", "SKYEYE_INT8_NECK")

VARIANTS = {
    "base": {},  # current defaults (stem barrier ON since 2026-08-19)
    "nobarrier": {"SKYEYE_NO_STEM_BARRIER": "1"},
    "barrier": {"SKYEYE_STEM_BARRIER": "1"},  # legacy alias of base
    "shiftmax": {"SKYEYE_SPP_SHIFTMAX": "1"},
    "both": {"SKYEYE_STEM_BARRIER": "1", "SKYEYE_SPP_SHIFTMAX": "1"},
    # packed_m measured -4.8% on chip -> default OFF; "packedm" opts in
    "packedm": {"SKYEYE_PACKED_M": "1"},
    "barrier_packedm": {"SKYEYE_STEM_BARRIER": "1", "SKYEYE_PACKED_M": "1"},
    # force a materialized bf16 stem input (XLA otherwise sinks the u8->bf16
    # convert into the stem conv, which runs at ~50% of MXU floor)
    "stembf16": {"SKYEYE_STEM_BF16_MATERIALIZE": "1"},
    # CBAM spatial-attention 7x7 conv as VPU shift-adds (the 2-in/1-out-lane
    # conv runs at 0.5% of floor, 154 us: profiles/r4s4_1280_barrier)
    "spattn": {"SKYEYE_SPATTN_SHIFTADD": "1"},
    # int8 stem: stem conv as u8(-128)xs8->s32 on the 2x int8 MXU path —
    # the biggest single-conv residue (1.90 ms vs 0.61 floor, ops/int8_stem.py)
    "int8stem": {"SKYEYE_INT8_STEM": "1"},
    # int8 neck: every neck conv s8xs8->s32 with calibrated activation scales
    # (unit-level 1.28x at neck-class shapes, profiles/int8_deep_bench.json)
    "int8neck": {"SKYEYE_INT8_NECK": "1"},
    "int8both": {"SKYEYE_INT8_STEM": "1", "SKYEYE_INT8_NECK": "1"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=1280)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=24)
    ap.add_argument("--variants", default="base,barrier,shiftmax,both")
    ap.add_argument("--model", default="skyeye_s")
    ap.add_argument("--auto-layout", action="store_true",
                    help="AOT-compile each variant with Layout.AUTO inputs and "
                         "device_put the frames in the compiler-chosen format "
                         "(the shipped bench.py headline path) — layout-"
                         "sensitive variants like packedm measure differently "
                         "under AUTO than under the default input layout")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    import bench
    from skyeye_tpu.ops.packed_stem import s2d4_host
    from skyeye_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    bench._probe_batched_nms_kernel()

    rng = np.random.default_rng(0)
    packed = s2d4_host(rng.integers(
        0, 255, (args.batch, args.img, args.img, 3)).astype(np.uint8))

    results = {}
    for name in args.variants.split(","):
        env = VARIANTS[name]
        saved = {k: os.environ.get(k) for k in _FLAGS}
        for k in _FLAGS:
            os.environ.pop(k, None)
        os.environ.update(env)
        try:
            _, _, _, _, body = bench._build_pipeline(
                args.model, args.img, bench.NC, args.batch)
            t0 = time.time()
            if args.auto_layout:
                from jax.experimental.layout import Format, Layout

                fn = (jax.jit(body, in_shardings=Format(Layout.AUTO))
                      .lower(jax.ShapeDtypeStruct(packed.shape, jnp.uint8))
                      .compile())
                x = bench._put_with_format(packed, fn.input_formats[0][0])
            else:
                fn = jax.jit(body)
                x = jnp.asarray(packed)
            jax.block_until_ready(fn(x))
            compile_s = time.time() - t0
            # warm
            jax.block_until_ready(fn(x))
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [fn(x) for _ in range(args.rounds)]
                jax.block_until_ready(outs)
                ips = args.batch * args.rounds / (time.perf_counter() - t0)
                best = max(best, ips)
            results[name] = best
            print(f"{name:10} {best:8.1f} img/s  (compile {compile_s:.0f}s)",
                  flush=True)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    base = results.get("base")
    for name, ips in results.items():
        if base and name != "base":
            print(f"{name}: {ips/base*100-100:+.1f}% vs base")


if __name__ == "__main__":
    main()
