"""Primitive building blocks, flax/NHWC, TPU-first.

Capability parity (reference /root/reference/skyeye/core/models/blocks.py):
  ConvBlock           <- ConvolutionBlock        (blocks.py:10-41)
  DepthwiseSeparable  <- DepthwiseSeparableConv  (blocks.py:44-66)
  Bottleneck          <- BottleneckBlock         (blocks.py:69-90)
  CSPBlock            <- CSPBlock                (blocks.py:93-123)
  SPPBlock            <- SPPBlock                (blocks.py:126-149)
  FocusBlock          <- FocusBlock              (blocks.py:152-182)

TPU-native design notes:
  * NHWC layout everywhere — the natural layout for TPU convolutions (channels on the
    128-lane axis).
  * Explicit symmetric padding k//2 (torch semantics), so torch checkpoints convert
    bit-compatibly; `padding='SAME'` would pad asymmetrically for stride-2.
  * Compute dtype is configurable (bfloat16 on TPU); params and BN stats stay float32.
  * conv+BN+SiLU is left as three XLA ops — XLA fuses BN-scale and SiLU into the conv
    epilogue on TPU; a folded `fuse_conv_bn` (utils/checkpoint.py) covers inference
    like the reference's `fused_forward` (blocks.py:39-41).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# Matches the reference init scheme: normal(0, sqrt(2 / (kh*kw*out_ch)))
# (reference detector.py:326-335).
conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class ConvBlock(nn.Module):
    """Conv2d (no bias) + BatchNorm + SiLU with torch-style auto-padding."""

    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    groups: int = 1
    activation: bool = True
    dtype: Any = jnp.float32
    # torch BatchNorm2d defaults (the reference uses stock nn.BatchNorm2d,
    # blocks.py:32): eps=1e-5; torch momentum 0.1 == flax momentum 0.9
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9
    # explicit padding override ((top, bottom), (left, right)); None = torch k//2
    padding: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        ks = tuple(k) if isinstance(k, (tuple, list)) else (k, k)
        st = (tuple(self.stride) if isinstance(self.stride, (tuple, list))
              else (self.stride, self.stride))
        x = _spatial_guard(x)
        x = nn.Conv(
            self.out_channels,
            ks,
            strides=st,
            padding=(self.padding if self.padding is not None
                     else tuple((d // 2, d // 2) for d in ks)),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=conv_kernel_init,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        if self.activation:
            x = nn.silu(x)
        return x


class DepthwiseSeparable(nn.Module):
    """gcd-grouped conv wrapper (reference blocks.py:44-66)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    activation: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math

        groups = math.gcd(self.in_channels, self.out_channels)
        return ConvBlock(
            self.out_channels,
            self.kernel_size,
            self.stride,
            groups=groups,
            activation=self.activation,
            dtype=self.dtype,
            name="conv",
        )(x, train)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 with optional residual; hidden = out * expansion."""

    out_channels: int
    shortcut: bool = True
    expansion: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_channels * self.expansion)
        y = ConvBlock(hidden, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBlock(self.out_channels, 3, 1, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.out_channels:
            y = x + y
        return y


class CSPBlock(nn.Module):
    """Cross-stage-partial: split -> N bottlenecks || bypass -> concat -> 1x1.

    merged_cv12: serving-path layout that computes the two 1x1 split convs
    (cv1, cv2 — both read the SAME input) as ONE conv with 2*hidden output
    channels, then splits. Exactly equivalent per-channel math (conv output
    channels are independent; BN stats are per-channel), but the input tensor
    is read from HBM once instead of twice — the split convs at 160-320px maps
    are HBM-bound (profiles/roofline.json). Use with variables transformed by
    ops.merged_csp.merge_csp_cv12_variables.
    """

    out_channels: int
    num_blocks: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    dtype: Any = jnp.float32
    merged_cv12: bool = False
    # Serving-path W-paired block residency: run the whole CSP in a
    # width-paired layout (B, H, W/2, 2*ch). Motivation (round-4 per-op
    # attribution, profiles/r4s1_1280): at hidden=64 the chain's 3x3 convs
    # occupy 64 of the 128 MXU/VPU lanes and measure ~26% of their roofline
    # floor (640 us vs 170 @1280 b16, six instances across csp2+fpn3); the
    # W-pair layout doubles lanes to 128 at only 2x nominal MXU FLOPs (the
    # (2,2)-s2d pack of ops/packed_csp.py would cost 4x — a wash at 64ch).
    # The split conv(s) emit the paired layout, cv3 consumes it (see __call__
    # body). Exact weight remap via ops.packed_csp.pack_csp_m_variables.
    packed_m: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_channels * self.expansion)
        # same predicate as ops.packed_csp.pack_csp_m_variables: only narrow
        # chains benefit (wider ones already fill the 128 lanes), and W-pairing
        # needs an even map width
        packed_m = self.packed_m and hidden < 128 and x.shape[2] % 2 == 0
        if packed_m:
            # The WHOLE block lives in the W-paired domain: the split conv(s)
            # EMIT the paired layout directly (a 1x2/stride-(1,2) conv — exact
            # remap, ops/packed_csp.py), the chain runs at 2*hidden lanes, and
            # cv3 CONSUMES the paired layout, emitting both pixels' outputs as
            # channel pairs that reshape back to canonical without any lane
            # padding (a bitcast). v1 of this idea reshaped at the chain
            # boundary instead — the lane-padded relayouts cost 1.9 ms @1280
            # b16 and erased the win (profiles/r4s2_packedm).
            _vp = ((0, 0), (0, 0))  # the 1x2/s2 pair-emit conv pads nothing
            if self.merged_cv12:
                y = ConvBlock(4 * hidden, (1, 2), (1, 2), padding=_vp,
                              dtype=self.dtype, name="cv12")(x, train)
                y1, y2 = y[..., : 2 * hidden], y[..., 2 * hidden :]
            else:
                y1 = ConvBlock(2 * hidden, (1, 2), (1, 2), padding=_vp,
                               dtype=self.dtype, name="cv1")(x, train)
                y2 = ConvBlock(2 * hidden, (1, 2), (1, 2), padding=_vp,
                               dtype=self.dtype, name="cv2")(x, train)
            for i in range(self.num_blocks):
                y1 = Bottleneck(2 * hidden, self.shortcut, 1.0,
                                dtype=self.dtype, name=f"m{i}")(y1, train)
            y = jnp.concatenate([y1, y2], axis=-1)
            y = ConvBlock(2 * self.out_channels, 1, 1, dtype=self.dtype,
                          name="cv3")(y, train)
            B, H, Wp, C2 = y.shape
            return y.reshape(B, H, Wp * 2, C2 // 2)
        if self.merged_cv12:
            y12 = ConvBlock(2 * hidden, 1, 1, dtype=self.dtype, name="cv12")(x, train)
            y1, y2 = y12[..., :hidden], y12[..., hidden:]
        else:
            y1 = ConvBlock(hidden, 1, 1, dtype=self.dtype, name="cv1")(x, train)
            y2 = ConvBlock(hidden, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.num_blocks):
            y1 = Bottleneck(
                hidden, self.shortcut, 1.0, dtype=self.dtype, name=f"m{i}"
            )(y1, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBlock(self.out_channels, 1, 1, dtype=self.dtype, name="cv3")(y, train)


def _spatial_guard(x, min_rows_per_shard: int = 4):
    """Gather image rows off the mesh "spatial" axis once maps get too short.

    GSPMD's windowed-op partitioning produces wrong gradients when a spatial
    shard holds ~1 row at wide channel counts (measured: 3x3 conv stacks at
    64ch/1-row shards diverge ~60%+ on an 8-device CPU mesh, jax 0.9.0), and at
    that size halo exchange costs more than the compute anyway. Deep stages
    (P5 at /32) therefore run spatially gathered; high-res stages — where the
    FLOPs are — keep the spatial parallelism.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is not None and "spatial" in mesh.axis_names:
        n_sp = mesh.shape["spatial"]
        if n_sp > 1 and x.shape[1] // n_sp < min_rows_per_shard:
            from jax.sharding import PartitionSpec as P

            return jax.lax.with_sharding_constraint(x, P("data"))
    return x


def _unshard_spatial(x):
    """Gather image rows off the mesh "spatial" axis (no-op otherwise).

    XLA's select-and-scatter — the backward of stride-1 max_pool — produces
    wrong input gradients when its window-crossing operand is sharded over a
    mesh axis (measured ~90%% error on an 8-device CPU mesh, jax 0.9.0), so the
    SPP pools must run on spatially-contiguous data. SPP sits on P5 (H/32),
    the smallest map in the network, so the gather is cheap.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is not None and "spatial" in mesh.axis_names:
        from jax.sharding import PartitionSpec as P

        return jax.lax.with_sharding_constraint(x, P("data"))
    return x


def _spatial_mesh_active() -> bool:
    """True when the surrounding mesh shards image rows (a >1 "spatial" axis)."""
    mesh = jax.sharding.get_abstract_mesh()
    return (mesh is not None and "spatial" in mesh.axis_names
            and mesh.shape["spatial"] > 1)


def _shift_max(t, s: int, axis: int):
    """Left-shift t by s along axis, filling the vacated tail with -inf."""
    if s == 0:
        return t
    pad_width = [(0, 0)] * t.ndim
    pad_width[axis] = (0, s)
    tp = jnp.pad(t, pad_width, constant_values=-jnp.inf)
    return jax.lax.slice_in_dim(tp, s, s + t.shape[axis], axis=axis)


def _window_max_1d(x, k: int, axis: int):
    """Running max over a length-k forward window via van Herk doubling:
    out[i] = max(x[i .. i+k-1]) in O(log k) elementwise maxima."""
    m = x
    span = 1
    while span * 2 <= k:
        m = jnp.maximum(m, _shift_max(m, span, axis))
        span *= 2
    if span < k:
        # remainder r < span, so [i, i+span) U [i+r, i+r+span) covers [i, i+k)
        m = jnp.maximum(m, _shift_max(m, k - span, axis))
    return m


def _maxpool_same_shiftmax(x, k: int):
    """Stride-1 SAME k x k max pool as a separable shift-max chain (NHWC).

    Numerically identical to nn.max_pool(window (k,k), stride 1, pad k//2) but
    built from elementwise maxima over statically shifted copies, so its
    backward is a chain of selects instead of XLA select-and-scatter — which
    GSPMD mis-partitions on spatially row-sharded operands (wrong input grads,
    ~90%% error; see _unshard_spatial). Shifts across the sharded row axis
    lower to halo exchanges, so SPP can stay sharded. O(log k) maxima per axis
    on the tiny P5 map."""
    p = k // 2
    # SAME centering: out[i] = max(x[i-p .. i+p]) — prepend p -inf rows, take
    # the forward-window max, keep the first H entries
    out = x
    for axis in (1, 2):
        pw = [(0, 0)] * x.ndim
        pw[axis] = (p, 0)
        xp = jnp.pad(out, pw, constant_values=-jnp.inf)
        m = _window_max_1d(xp, k, axis)
        out = jax.lax.slice_in_dim(m, 0, x.shape[axis], axis=axis)
    return out


def _reshard_spatial(x):
    """Inverse of _unshard_spatial: put rows back on the "spatial" axis."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is not None and "spatial" in mesh.axis_names:
        from jax.sharding import PartitionSpec as P

        return jax.lax.with_sharding_constraint(x, P("data", "spatial"))
    return x


class SPPBlock(nn.Module):
    """Spatial pyramid pooling: maxpool k in kernel_sizes at stride 1, concat."""

    out_channels: int
    kernel_sizes: Sequence[int] = (5, 9, 13)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch // 2
        x = ConvBlock(hidden, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        # SKYEYE_SPP_SHIFTMAX extends the shift-max chain to inference: the
        # round-4 per-op attribution (profiles/r4s1_1280/roofline_attrib.json)
        # measured the two reduce_window fusions at 369 us vs a 64 us HBM floor
        # @1280 b16 — the chain is plain elementwise VPU traffic instead.
        import os as _os

        if _spatial_mesh_active() or train or _os.environ.get("SKYEYE_SPP_SHIFTMAX"):
            # Shift-max pools, built INCREMENTALLY (SPPF-style: stride-1 SAME
            # window maxima compose, max_{k2}(max_{k1}(x)) == max_{k1+k2-1}(x),
            # so (5, 9, 13) costs three 5-window chains instead of 5+9+13).
            #   * sharded: backward = select chain keeps P5 row-sharded
            #     (select-and-scatter, nn.max_pool's grad, hits a GSPMD bug
            #     AND would force the _unshard_spatial gather)
            #   * train (any mesh): select-and-scatter was measured at
            #     5.04 ms of the 37 ms train step @640 b16 on v5e — 13.6% of
            #     the whole step in the pool backward
            #     (profiles/r3s8_train640) — while the select-chain backward
            #     is plain elementwise traffic.
            pools = [x]
            prev_k = 1
            for k in self.kernel_sizes:
                delta = k - prev_k + 1  # window growth this stage
                if delta >= 2 and prev_k > 1:
                    pools.append(_maxpool_same_shiftmax(pools[-1], delta))
                else:  # first pool, or non-increasing kernel list: from x
                    pools.append(_maxpool_same_shiftmax(x, k))
                prev_k = k
            y = jnp.concatenate(pools, axis=-1)
        else:
            # Pure inference: reduce_window forward compiles tighter than the
            # shift chain and has no backward to worry about.
            pools = [x]
            for k in self.kernel_sizes:
                p = k // 2
                pools.append(
                    nn.max_pool(
                        x,
                        window_shape=(k, k),
                        strides=(1, 1),
                        padding=((p, p), (p, p)),
                    )
                )
            y = jnp.concatenate(pools, axis=-1)
        y = ConvBlock(self.out_channels, 1, 1, dtype=self.dtype, name="cv2")(y, train)
        return y


def space_to_depth_2x2(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C) in the reference's patch order
    [top-left, bottom-left, top-right, bottom-right] (blocks.py:176-181)."""
    return jnp.concatenate(
        [
            x[:, ::2, ::2, :],
            x[:, 1::2, ::2, :],
            x[:, ::2, 1::2, :],
            x[:, 1::2, 1::2, :],
        ],
        axis=-1,
    )


class FocusBlock(nn.Module):
    """Focus stem: space-to-depth 2x2 -> conv, computed as ONE fused conv.

    TPU-native redesign: strided slicing + concat on a 3-channel NHWC image is
    catastrophically slow on TPU (C=3 occupies 3 of 128 lanes, and the four strided
    gathers each re-read the full frame) — measured 120 ms of a 150 ms backbone at
    1280px batch 16. s2d(2x2) followed by a k x k conv is EXACTLY equal to a single
    2k x 2k stride-2 convolution on the raw image with permuted weights:
        K2k[2i+dy, 2j+dx, c, o] = Kk[i, j, p(dy,dx)*C+c, o]
    (p = patch index in the reference's TL,BL,TR,BR order, blocks.py:176-181).
    `fused_stem_kernel` converts reference 3x3-on-12ch weights to the fused 6x6 form;
    tests assert bit-level equivalence of both formulations.
    """

    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    activation: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.stride == 1, "FocusBlock supports stride 1 (reference usage)"
        k = self.kernel_size
        kf = 2 * k
        p = 2 * (k // 2)
        x = nn.Conv(
            self.out_channels,
            (kf, kf),
            strides=(2, 2),
            padding=((p, p), (p, p)),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=conv_kernel_init,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        if self.activation:
            x = nn.silu(x)
        return x


# patch order TL, BL, TR, BR (space_to_depth_2x2): p -> (dy, dx)
_S2D_OFFSETS = ((0, 0), (1, 0), (0, 1), (1, 1))


def fused_stem_kernel(k_s2d):
    """Convert a (k, k, 4C, O) HWIO kernel (conv over space-to-depth output) into the
    equivalent (2k, 2k, C, O) stride-2 kernel over the raw image."""
    import numpy as np

    k_s2d = np.asarray(k_s2d)
    k, _, c4, o = k_s2d.shape
    c = c4 // 4
    out = np.zeros((2 * k, 2 * k, c, o), k_s2d.dtype)
    for p_idx, (dy, dx) in enumerate(_S2D_OFFSETS):
        out[dy::2, dx::2, :, :] = k_s2d[:, :, p_idx * c : (p_idx + 1) * c, :]
    return out


def unfuse_stem_kernel(k_fused):
    """Inverse of fused_stem_kernel: (2k, 2k, C, O) -> (k, k, 4C, O)."""
    import numpy as np

    k_fused = np.asarray(k_fused)
    k2, _, c, o = k_fused.shape
    k = k2 // 2
    out = np.zeros((k, k, 4 * c, o), k_fused.dtype)
    for p_idx, (dy, dx) in enumerate(_S2D_OFFSETS):
        out[:, :, p_idx * c : (p_idx + 1) * c, :] = k_fused[dy::2, dx::2, :, :]
    return out
