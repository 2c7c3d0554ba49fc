"""Attention modules, flax/NHWC, TPU-first.

Capability parity (reference /root/reference/skyeye/core/models/attention.py):
  ChannelAttention      <- ChannelAttention       (attention.py:11-60)
  SpatialAttention      <- SpatialAttention       (attention.py:63-98)
  CBAM                  <- CombinedAttention      (attention.py:101-130)
  CrossLayerAttention   <- CrossLayerAttention    (attention.py:133-241)
  TransformerLayer      <- TransformerLayer       (attention.py:244-309)
  WindowedSelfAttention <- WindowedSelfAttention  (attention.py:312-399)

TPU-native notes:
  * NHWC: channel reductions land on the lane axis; the CBAM MLP is two small GEMMs.
  * CrossLayerAttention: the reference's region loop re-interpolates the SAME full map
    region_size^2 times (attention.py:208-215) — degenerate uniform attention. Here it
    is a TRUE local-region cross-attention: K/V are bilinear-resampled to the query
    grid once, then shifted by the region offsets, so each query attends over a real
    region_size x region_size neighborhood of the coarser level (documented deviation,
    SURVEY.md M10).
  * Windowed attention stays one big batched einsum per (window, head) — MXU-shaped.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ChannelAttention(nn.Module):
    """SE-style gate: (avg-pool + max-pool) -> shared MLP -> sigmoid."""

    reduction_ratio: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        channels = x.shape[-1]
        reduced = max(channels // self.reduction_ratio, 1)
        mlp = nn.Sequential(
            [
                nn.Dense(reduced, use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name="fc1"),
                nn.relu,
                nn.Dense(channels, use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name="fc2"),
            ]
        )
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        gate = jax.nn.sigmoid(mlp(avg) + mlp(mx))
        return x * gate[:, None, None, :]


class _SpatialAttnKernel(nn.Module):
    """Bare (k, k, 2, 1) conv kernel param under the same {conv: {kernel}} tree
    nn.Conv would create — the shift-add path below needs the raw weights."""

    kernel_size: int = 7

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, 2, 1), jnp.float32)


class SpatialAttention(nn.Module):
    """Channel-mean/max maps -> kxk conv -> sigmoid gate.

    The kxk conv has 2 input / 1 output channels — 2 of 128 MXU lanes — and
    XLA's conv emitter runs it at ~0.5% of its roofline (154 us for 0.3 MFLOP
    at the 1280-serving cbam3 geometry, profiles/r4s4_1280_barrier fusion.418).
    `SKYEYE_SPATTN_SHIFTADD=1` computes the identical conv as k*k shifted
    multiply-adds on the VPU instead (one fused loop over (B,H,W,2) planes, a
    single final 2-lane reduce); parameter tree and numerics match the conv
    path (tests/test_models.py::test_spatial_attention_shiftadd_matches_conv).
    """

    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os

        avg_map = jnp.mean(x, axis=-1, keepdims=True)
        max_map = jnp.max(x, axis=-1, keepdims=True)
        stats = jnp.concatenate([avg_map, max_map], axis=-1)
        p = self.kernel_size // 2
        if os.environ.get("SKYEYE_SPATTN_SHIFTADD"):
            k = self.kernel_size
            kernel = _SpatialAttnKernel(kernel_size=k, name="conv")()
            # match the conv path's operand precision (nn.Conv casts the f32
            # kernel to self.dtype before multiplying) ...
            kernel = kernel.astype(self.dtype).astype(jnp.float32)
            # ... with f32 accumulation (the TPU conv accumulates bf16
            # products in f32; a bf16 chain of 98 adds would drift)
            sp = jnp.pad(stats.astype(jnp.float32),
                         ((0, 0), (p, p), (p, p), (0, 0)))
            B, H, W, _ = stats.shape
            acc = jnp.zeros((B, H, W, 2), jnp.float32)
            for dy in range(k):
                for dx in range(k):
                    win = jax.lax.slice(
                        sp, (0, dy, dx, 0), (B, dy + H, dx + W, 2))
                    acc = acc + win * kernel[dy, dx, :, 0]
            gate = jnp.sum(acc, axis=-1, keepdims=True).astype(self.dtype)
        else:
            gate = nn.Conv(
                1,
                (self.kernel_size, self.kernel_size),
                padding=((p, p), (p, p)),
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(stats)
        return x * jax.nn.sigmoid(gate)


class CBAM(nn.Module):
    """Sequential channel then spatial attention (CombinedAttention)."""

    reduction_ratio: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ChannelAttention(self.reduction_ratio, dtype=self.dtype, name="channel")(x)
        x = SpatialAttention(dtype=self.dtype, name="spatial")(x)
        return x


def _flash_backend_ok() -> bool:
    """Flash kernel gate: TPU backends only (XLA's einsum fusion wins on CPU).
    SKYEYE_FLASH_INTERPRET=1 forces the branch on any backend with the kernel in
    interpret mode — lets CPU tests exercise the real gate + custom VJP."""
    import os

    if os.environ.get("SKYEYE_NO_PALLAS"):
        return False
    if os.environ.get("SKYEYE_FLASH_INTERPRET"):
        return True
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _bilinear_resize(x, out_h: int, out_w: int):
    """NHWC bilinear resize with align_corners=False semantics (static shapes)."""
    return jax.image.resize(x, (x.shape[0], out_h, out_w, x.shape[3]), method="bilinear")


class CrossLayerAttention(nn.Module):
    """Local-region multi-head cross-attention between pyramid levels.

    Query from the finer level, K/V from the coarser level resampled to the query grid
    and shifted over a region_size x region_size neighborhood. Softmax over the region
    positions; 1x1 projections around the attention.
    """

    query_channels: int
    key_channels: int
    value_channels: Optional[int] = None
    region_size: int = 2
    output_channels: Optional[int] = None
    heads: int = 4
    dtype: Any = jnp.float32
    # Reference-exact compatibility mode (parity/weight-import only). The
    # reference's region loop stacks the SAME bilinear-upsampled K/V r^2 times and
    # its softmax runs over the H axis (attention.py:180/232 dim=3 of
    # [B, heads, r^2, H, W]), so its true semantics are: per-head q.k similarity
    # -> softmax over image ROWS -> r^2 * attn * V (no neighborhood structure).
    # Additionally its q*k product requires Cq == Ck per head, so the enhanced
    # detector's c4/c5 pairing crashes as-shipped; the minimal repair (mirrored
    # here) projects Q to key_channels. ref_exact=True reproduces that repaired
    # computation exactly for weight-mapped parity with EnhancedSkyEyeDetector
    # (reference detector.py:436-501); default False is the true local-region
    # redesign (SURVEY.md M10).
    ref_exact: bool = False

    @nn.compact
    def __call__(self, query, key, value=None):
        if value is None:
            value = key
        v_ch = self.value_channels or self.key_channels
        out_ch = self.output_channels or self.query_channels
        scale = 1.0 / float(np.sqrt(self.query_channels))
        r = self.region_size

        if self.ref_exact:
            q = nn.Conv(self.key_channels, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="q_proj")(query)
            k = nn.Conv(self.key_channels, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="k_proj")(key)
            v = nn.Conv(v_ch, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="v_proj")(value)
            B, gh, gw, _ = q.shape
            k = _bilinear_resize(k, gh, gw)
            v = _bilinear_resize(v, gh, gw)
            hk = self.key_channels // self.heads
            hv = v_ch // self.heads
            scores = jnp.einsum(
                "bhwnc,bhwnc->bhwn",
                q.reshape(B, gh, gw, self.heads, hk),
                k.reshape(B, gh, gw, self.heads, hk),
            ) * scale
            attn = jax.nn.softmax(scores.astype(jnp.float32), axis=1)  # over rows
            out = (float(r * r) * attn[..., None]).astype(self.dtype) * v.reshape(
                B, gh, gw, self.heads, hv
            )
            return nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                           param_dtype=jnp.float32, name="out_proj")(
                out.reshape(B, gh, gw, v_ch)
            )

        q = nn.Conv(self.query_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="q_proj")(query)
        k = nn.Conv(self.key_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="k_proj")(key)
        v = nn.Conv(v_ch, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="v_proj")(value)

        B, qh, qw, _ = q.shape
        k = _bilinear_resize(k, qh, qw)
        v = _bilinear_resize(v, qh, qw)

        # Neighborhood shifts: offsets centered on the query position.
        lo = -(r - 1) // 2
        shifts = [(lo + i, lo + j) for i in range(r) for j in range(r)]

        def shifted(t, dy, dx):
            # edge-replicate shift via pad+slice (static)
            t = jnp.pad(
                t,
                ((0, 0), (max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0)), (0, 0)),
                mode="edge",
            )
            return t[
                :,
                max(-dy, 0) : max(-dy, 0) + qh,
                max(-dx, 0) : max(-dx, 0) + qw,
                :,
            ]

        ks = jnp.stack([shifted(k, dy, dx) for dy, dx in shifts], axis=1)  # (B,R,H,W,Ck)
        vs = jnp.stack([shifted(v, dy, dx) for dy, dx in shifts], axis=1)  # (B,R,H,W,Cv)

        hq = self.query_channels // self.heads
        hk = self.key_channels // self.heads
        hv = v_ch // self.heads
        qh_ = q.reshape(B, qh, qw, self.heads, hq)
        ks_ = ks.reshape(B, r * r, qh, qw, self.heads, hk)
        vs_ = vs.reshape(B, r * r, qh, qw, self.heads, hv)

        # attention over region positions; heads share spatial position
        d = min(hq, hk)
        logits = jnp.einsum(
            "bhwnc,brhwnc->brhwn", qh_[..., :d], ks_[..., :d]
        ) * scale
        attn = jax.nn.softmax(logits, axis=1)
        out = jnp.einsum("brhwn,brhwnc->bhwnc", attn, vs_)
        out = out.reshape(B, qh, qw, v_ch)
        return nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="out_proj")(out)


class MultiHeadSelfAttention(nn.Module):
    """MHSA over a (B, N, C) token sequence (one fused qkv GEMM).

    When `use_flash` (no mask/bias, TPU backend, N large enough to matter), the
    attention core runs as the fused Pallas flash kernel — tokens/head-dim are
    zero-padded to 128 multiples and masked inside the kernel
    (ops/pallas/attention_kernel.py:padded_flash_attention), so the P5 transformer
    head engages it at every flagship resolution (400 tokens @640, 1600 @1280).
    Scores never leave VMEM. The einsum path covers masked/biased and tiny-window
    cases, where XLA is already optimal.
    """

    num_heads: int
    dtype: Any = jnp.float32
    use_flash: bool = True

    @nn.compact
    def __call__(self, x, mask=None, bias=None):
        B, N, C = x.shape
        hd = C // self.num_heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        flash_ok = (
            self.use_flash
            and mask is None
            and bias is None
            and N >= 256  # tiny windows: einsum beats the kernel's pad overhead
            and _flash_backend_ok()
        )
        # Trainable: padded_flash_attention carries a custom VJP (einsum-recompute
        # backward), so this branch is safe under jax.grad — no train gate needed.
        if flash_ok:
            import os

            from ..ops.pallas.attention_kernel import padded_flash_attention

            interpret = bool(os.environ.get("SKYEYE_FLASH_INTERPRET"))
            qf = q.transpose(0, 2, 1, 3).reshape(B * self.num_heads, N, hd)
            kf = k.transpose(0, 2, 1, 3).reshape(B * self.num_heads, N, hd)
            vf = v.transpose(0, 2, 1, 3).reshape(B * self.num_heads, N, hd)
            of = padded_flash_attention(
                qf.astype(jnp.float32), kf.astype(jnp.float32),
                vf.astype(jnp.float32), interpret=interpret,
            )
            out = of.reshape(B, self.num_heads, N, hd).transpose(0, 2, 1, 3)
            out = out.reshape(B, N, C).astype(self.dtype)
        else:
            logits = jnp.einsum("bqhc,bkhc->bhqk", q, k) * (hd**-0.5)
            if bias is not None:
                logits = logits + bias
            if mask is not None:
                logits = logits + mask
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
                logits.dtype
            )
            out = jnp.einsum("bhqk,bkhc->bqhc", attn, v).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class TransformerLayer(nn.Module):
    """Pre-norm MHSA + ReLU-FFN over flattened H*W tokens (reference :244-309)."""

    num_heads: int
    feedforward_dim: Optional[int] = None
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        ff = self.feedforward_dim or C * 4
        t = x.reshape(B, H * W, C)

        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(t)
        y = MultiHeadSelfAttention(self.num_heads, dtype=self.dtype, name="attn")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        t = t + y

        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(t)
        y = nn.Dense(ff, dtype=self.dtype, param_dtype=jnp.float32, name="ff1")(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="ff2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        t = t + y

        return t.reshape(B, H, W, C)


def window_partition(x, window_size: int):
    """(B, H, W, C) -> (B * nH * nW, ws*ws, C). H, W must be multiples of ws."""
    B, H, W, C = x.shape
    ws = window_size
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, ws * ws, C)


def window_reverse(windows, window_size: int, H: int, W: int):
    """Inverse of window_partition: (B*nH*nW, ws*ws, C) -> (B, H, W, C)."""
    ws = window_size
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H, W, -1)


def shift_window_mask(H: int, W: int, window_size: int, shift: int) -> jnp.ndarray:
    """Swin shifted-window attention mask: (num_windows, ws*ws, ws*ws) additive
    (-100 for cross-region pairs)."""
    img_mask = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    slices = (slice(0, -window_size), slice(-window_size, -shift), slice(-shift, None))
    for h in slices:
        for w in slices:
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mw = np.asarray(window_partition(jnp.asarray(img_mask), window_size))[:, :, 0]
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return jnp.asarray(np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32))


class SwinBlock(nn.Module):
    """Usable windowed-attention block: partition -> (shifted) window attention ->
    reverse, with pre-norm residual + MLP. Makes the reference's shipped-but-unused
    WindowedSelfAttention (attention.py:312-399) an actual model component."""

    window_size: int = 8
    num_heads: int = 4
    shift: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        ws = self.window_size
        assert H % ws == 0 and W % ws == 0, (H, W, ws)
        shift = self.shift % ws

        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        wins = window_partition(y, ws)
        mask = shift_window_mask(H, W, ws, shift) if shift else None
        wins = WindowedSelfAttention(
            dim=C, window_size=ws, num_heads=self.num_heads, dtype=self.dtype,
            name="attn",
        )(wins, mask)
        y = window_reverse(wins, ws, H, W)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = x + y

        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        y = nn.Dense(C * 4, dtype=self.dtype, param_dtype=jnp.float32, name="mlp1")(y)
        y = nn.gelu(y)
        y = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="mlp2")(y)
        return x + y


def relative_position_index(window_size: int) -> np.ndarray:
    """Static Swin-style relative position index table (N, N)."""
    coords = np.stack(
        np.meshgrid(np.arange(window_size), np.arange(window_size), indexing="ij")
    )  # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window_size - 1
    rel[:, :, 1] += window_size - 1
    rel[:, :, 0] *= 2 * window_size - 1
    return rel.sum(-1)


class WindowedSelfAttention(nn.Module):
    """Swin-style window attention with relative-position bias + optional shift mask.

    Input: (B * num_windows, window_size^2, C), like the reference (:358-369).
    """

    dim: int
    window_size: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        B_, N, C = x.shape
        ws = self.window_size
        hd = C // self.num_heads

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads),
            jnp.float32,
        )
        rel_idx = jnp.asarray(relative_position_index(ws))  # (N, N)
        rel_bias = bias_table[rel_idx.reshape(-1)].reshape(N, N, self.num_heads)
        rel_bias = rel_bias.transpose(2, 0, 1)[None]  # (1, nh, N, N)

        qkv = nn.Dense(3 * C, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(B_, N, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q * (hd**-0.5)
        attn = jnp.einsum("bqhc,bkhc->bhqk", q, k) + rel_bias

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, self.num_heads, N, N)
            attn = attn + mask[None, :, None, :, :]
            attn = attn.reshape(B_, self.num_heads, N, N)

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhc->bqhc", attn, v).reshape(B_, N, C)
        return nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)
