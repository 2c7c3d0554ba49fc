"""Probe: are int8 convolutions faster than bf16 on this chip at SkyEye's
early-stage shapes?

The round-2 profile shows stage-1/2 convs are 67% of the serving pipeline and
HBM-BOUND at 64-128 channels — int8 activations halve the HBM traffic and the
v5e MXU has 2x int8 throughput (394 TOPS), so quantized early stages are the
main alternative to the fused-CSP kernel for the conv half of the north star
(round-2 VERDICT #1).

Measurement method: N serially-dependent convs chained in ONE launch via
lax.fori_loop (x = conv(x)), so the ~28 ms axon relay dispatch overhead and
launch noise cancel out — per-conv time = (t_chain(N) - t_chain(1)) / (N - 1).
The int8 chain includes the requantize step (f32 -> int8) the real pipeline
would pay between layers.

Usage: python tools/quant_probe.py
"""
from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def timed(fn, *args, iters=8):
    import jax

    jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import jax
    import jax.numpy as jnp

    from skyeye_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}")

    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    N_CHAIN = 200

    def make_bf16_chain(n):
        @jax.jit
        def chain(x, k):
            def body(i, x):
                y = jax.lax.conv_general_dilated(
                    x, k, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, n, body, x)
        return chain

    def make_int8_chain(n):
        @jax.jit
        def chain(x, k, scale):
            def body(i, x):
                y = jax.lax.conv_general_dilated(
                    x, k, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                y = y.astype(jnp.float32) * scale
                y = y * jax.nn.sigmoid(y)      # SiLU in f32
                # requantize for the next layer (per-tensor static scale)
                return jnp.clip(jnp.round(y * 12.7), -127, 127).astype(jnp.int8)
            return jax.lax.fori_loop(0, n, body, x)
        return chain

    rng = np.random.default_rng(0)
    for (B, H, W, C) in [(16, 320, 320, 64), (16, 160, 160, 128),
                         (16, 320, 320, 32)]:
        x_bf = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.bfloat16)
        k_bf = jnp.asarray(rng.normal(0, 0.05, (3, 3, C, C)), jnp.bfloat16)
        x_i8 = jnp.asarray(rng.integers(-127, 127, (B, H, W, C)), jnp.int8)
        k_i8 = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C)), jnp.int8)
        scale = jnp.float32(1e-4)

        t1 = timed(make_bf16_chain(1), x_bf, k_bf)
        tn = timed(make_bf16_chain(N_CHAIN), x_bf, k_bf)
        per_bf = (tn - t1) / (N_CHAIN - 1)
        line = (f"3x3 {B}x{H}x{W}x{C}: bf16+silu {per_bf:.3f} ms/conv "
                f"[t1={t1:.1f} tN={tn:.1f}]")
        try:
            t1i = timed(make_int8_chain(1), x_i8, k_i8, scale)
            tni = timed(make_int8_chain(N_CHAIN), x_i8, k_i8, scale)
            per_i8 = (tni - t1i) / (N_CHAIN - 1)
            line += (f" | int8+silu+requant {per_i8:.3f} ms/conv "
                     f"[t1={t1i:.1f} tN={tni:.1f}] ({per_bf / per_i8:.2f}x)")
        except Exception as e:
            line += f" | int8 FAILED {str(e)[:200]}"
        print(line)

    # roofline context: bytes per conv at bf16 vs int8
    for (B, H, W, C) in [(16, 320, 320, 64), (16, 160, 160, 128)]:
        byts_bf = B * H * W * C * 2 * 2  # read + write bf16
        flops = 2 * B * H * W * C * C * 9
        print(f"  shape {H}x{W}x{C}: {byts_bf/1e6:.0f} MB bf16 traffic/conv "
              f"(~{byts_bf/8.2e11*1e3:.2f} ms at 820 GB/s), {flops/1e9:.0f} GFLOP "
              f"(~{flops/1.97e14*1e3:.2f} ms at 197 TF/s bf16)")


if __name__ == "__main__":
    main()
