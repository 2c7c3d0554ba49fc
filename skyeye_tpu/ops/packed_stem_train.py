"""Train-mode packed stem: the serving s2d4 input layout, differentiably.

The serving pipeline feeds the network a 4x4 space-to-depth packed image and
runs the first two convs in the s2d domain at full 128-lane utilization
(ops/packed_stem.py — an offline weight remap, so the param tree holds the
REMAPPED kernels and the path cannot train).

The TRAIN step paid the canonical layout's full price: the first-ever train
profile (profiles/r3s8b_train640) shows the raw 6x6/2 stem conv on
(B, 640, 640, 3) costing 1.76 ms forward + 1.77 ms weight-grad + a 0.60 ms
input layout copy per step @640 b16 — ~11% of the 37 ms step burned on 3/128
lane occupancy. (The reference hits the same physics on CUDA and works around
it host-side with its Focus block, /root/reference/skyeye/core/models/
blocks.py:152-182; its training path pays it identically.)

This module runs the SAME packed-domain convs while keeping the param tree
canonical, so the flag is a pure layout choice:

  * the canonical (6, 6, C, c1) stem kernel and (3, 3, c1, c2) down1 kernel
    live at their usual paths (`stem/conv/kernel`, `down1/conv/kernel`);
    the s2d remaps (pack_stem_kernel / pack_down1_kernel derivations) are
    applied IN-forward as one constant-index gather — differentiable, so the
    backward's weight-gradient conv also contracts over 48/128 packed
    channels instead of 3;
  * stem BatchNorm statistics are phase-pooled: the packed stem output
    channel (a*2+b)*c1 + o is the (a, b) spatial phase of canonical channel
    o, and pooling sum/sum-of-squares over the 4 equal-count phases gives
    EXACTLY the canonical per-channel batch statistics (a mean of means over
    equal groups is the global mean). Running stats stay canonical (c1,)
    and the scale/bias params are canonical, so checkpoints interoperate
    bit-for-bit with the unpacked path.

Input: either the raw (B, H, W, 3) image (packed on device — a transpose the
caller should avoid by packing host-side / composing the permutation into the
device-aug gather) or the (B, H/4, W/4, 48) s2d4-packed frame from
`ops.packed_stem.s2d4_host` / `data.device_aug` — same convention as serving.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Any

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from .packed_stem import s2d4_device


@lru_cache(maxsize=None)
def _stem_gather_indices(C: int, c1: int):
    """Flat gather map for pack_stem_kernel as a single indexed read.

    Returns int32 (3, 3, 16C, 4c1) where entry i reads flat kernel element i
    of the canonical (6, 6, C, c1) kernel, and the sentinel 6*6*C*c1 reads an
    appended zero. Derivation: ops/packed_stem.py pack_stem_kernel."""
    n = 6 * 6 * C * c1
    idx = np.full((3, 3, 16 * C, 4 * c1), n, np.int32)
    flat = np.arange(n, dtype=np.int32).reshape(6, 6, C, c1)
    for a in range(2):
        for b in range(2):
            for r in range(6):
                u, dy = divmod(2 * a + r - 2, 4)
                for s in range(6):
                    v, dx = divmod(2 * b + s - 2, 4)
                    ci = (dy * 4 + dx) * C
                    co = (a * 2 + b) * c1
                    idx[u + 1, v + 1, ci : ci + C, co : co + c1] = flat[r, s]
    return idx


@lru_cache(maxsize=None)
def _down1_gather_indices(c1: int, c2: int):
    """Flat gather map for pack_down1_kernel: canonical (3, 3, c1, c2) ->
    packed (2, 2, 4c1, c2); sentinel 3*3*c1*c2 reads an appended zero."""
    n = 3 * 3 * c1 * c2
    idx = np.full((2, 2, 4 * c1, c2), n, np.int32)
    flat = np.arange(n, dtype=np.int32).reshape(3, 3, c1, c2)
    for r in range(3):
        u, dy = divmod(r - 1, 2)
        for s in range(3):
            v, dx = divmod(s - 1, 2)
            ci = (dy * 2 + dx) * c1
            idx[u + 1, v + 1, ci : ci + c1, :] = flat[r, s]
    return idx


def _remap(kernel: jnp.ndarray, idx: np.ndarray) -> jnp.ndarray:
    """Differentiable kernel remap: one gather over the flat kernel + a zero
    slot (the transpose is a scatter-add back onto the canonical kernel).

    Kept as the REFERENCE implementation (tests cross-check against it): on
    TPU this gather serializes per element (~8 ns each), costing 0.70 ms
    forward + its scatter-add transpose 0.77 ms per train step @640 b16
    (profiles/r4s5_train640: fusion/fusion.1 + fusion.5/fusion.6). The
    shipped path below expresses the same permutation as pad/reshape/
    transpose/concat, whose VJP is slice/transpose/reshape — dense µs-scale
    ops."""
    flat = jnp.concatenate([kernel.reshape(-1), jnp.zeros((1,), kernel.dtype)])
    return flat[jnp.asarray(idx)]


def pack_stem_kernel_dense(kernel: jnp.ndarray) -> jnp.ndarray:
    """pack_stem_kernel as dense reshapes: (6, 6, C, c1) -> (3, 3, 16C, 4c1).

    Derivation: the gather map (_stem_gather_indices) places canonical tap
    (r, s) of phase (a, b) at packed row position u+1 with input-channel
    phase dy, where u, dy = divmod(2a + r - 2, 4) — i.e. flat padded row
    p = 4(u+1) + dy = 2a + r + 2. So per phase: left-pad rows by 2a+2 (cols
    by 2b+2) to length 12, split (12,) -> (3 taps, 4 phases), reorder to
    (tap_r, tap_s, dy, dx, C, c1), merge (dy, dx, C) into the packed input
    channel (dy*4+dx)*C + c, and stack the 4 (a, b) phases along the output
    channel — exactly the serving-side remap (ops/packed_stem.py)."""
    _, _, C, c1 = kernel.shape
    parts = []
    for a in range(2):
        for b in range(2):
            p = jnp.pad(kernel, ((2 * a + 2, 4 - 2 * a),
                                 (2 * b + 2, 4 - 2 * b), (0, 0), (0, 0)))
            p = p.reshape(3, 4, 3, 4, C, c1).transpose(0, 2, 1, 3, 4, 5)
            parts.append(p.reshape(3, 3, 16 * C, c1))
    return jnp.concatenate(parts, axis=-1)


def pack_down1_kernel_dense(kernel: jnp.ndarray) -> jnp.ndarray:
    """pack_down1_kernel as dense reshapes: (3, 3, c1, c2) -> (2, 2, 4c1, c2).

    u, dy = divmod(r - 1, 2) -> flat padded row p = 2(u+1) + dy = r + 1:
    left-pad rows/cols by 1 to length 4, split (4,) -> (2 taps, 2 phases),
    reorder, merge (dy, dx, c1) into the packed input channel."""
    _, _, c1, c2 = kernel.shape
    p = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    p = p.reshape(2, 2, 2, 2, c1, c2).transpose(0, 2, 1, 3, 4, 5)
    return p.reshape(2, 2, 4 * c1, c2)


class _KernelHolder(nn.Module):
    """Holds a conv kernel param at the canonical `<name>/kernel` path so the
    packed-train modules' trees match FocusBlock/ConvBlock exactly."""

    shape: tuple

    @nn.compact
    def __call__(self):
        from ..models.blocks import conv_kernel_init

        return self.param("kernel", conv_kernel_init, self.shape, jnp.float32)


class PhasePooledBatchNorm(nn.Module):
    """BatchNorm over a phase-packed channel axis with CANONICAL statistics.

    Input channels are phase-major: channel p*features + o is spatial phase p
    of canonical channel o. Batch statistics are pooled across phases (exactly
    the canonical per-channel stats, since phases partition the spatial
    positions into equal-count groups); params/running stats are (features,)
    and named like flax nn.BatchNorm, so the tree matches the unpacked path.
    """

    features: int
    phases: int = 4
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f, ph = self.features, self.phases
        scale = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((f,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((f,), jnp.float32)
        )
        if train:
            # stats in (at least) float32, matching flax _compute_stats
            xf = x.astype(jnp.promote_types(jnp.float32, x.dtype))
            red = tuple(range(x.ndim - 1))
            n = float(np.prod(x.shape[:-1])) * ph
            s = jnp.sum(xf, red).reshape(ph, f).sum(0)
            ss = jnp.sum(xf * xf, red).reshape(ph, f).sum(0)
            mean = s / n
            # E[x^2] - E[x]^2, matching flax use_fast_variance (biased)
            var = jnp.maximum(ss / n - mean * mean, 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        add = bias - mean * mul
        mul = jnp.tile(mul, ph).astype(self.dtype)
        add = jnp.tile(add, ph).astype(self.dtype)
        return x.astype(self.dtype) * mul + add


class PackedTrainFocus(nn.Module):
    """FocusBlock computed in the s2d4 input domain with canonical params.

    Output is the 2x2-s2d packing of the canonical stem output
    (B, H/2, W/2, c1) -> (B, H/4, W/4, 4*c1), phase-major channels —
    exactly what PackedTrainDown1 consumes."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] == 3:  # raw image: pack on device
            x = s2d4_device(x)
        C = x.shape[-1] // 16
        c1 = self.out_channels
        kern = _KernelHolder((6, 6, C, c1), name="conv")()
        kp = pack_stem_kernel_dense(kern).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kp,
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = PhasePooledBatchNorm(c1, phases=4, dtype=self.dtype, name="bn")(
            y, train
        )
        return nn.silu(y)


class PackedTrainDown1(nn.Module):
    """down1 (3x3/2 ConvBlock) consuming the 2x2-s2d packed stem output with
    canonical params; emits the canonical (B, H/4, W/4, c2) tensor, so
    everything downstream of the stem pair is unchanged."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1] // 4
        c2 = self.out_channels
        kern = _KernelHolder((3, 3, c1, c2), name="conv")()
        kp = pack_down1_kernel_dense(kern).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kp,
            window_strides=(1, 1),
            padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(y)
        return nn.silu(y)
