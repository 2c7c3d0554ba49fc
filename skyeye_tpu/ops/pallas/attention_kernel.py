"""Pallas TPU kernel: fused (flash-style) self-attention for transformer heads.

North-star item (BASELINE.json: "attention ... blocks as fused Pallas kernels";
SURVEY.md M11/M12). Used by the TransformerLayer-enhanced P5 head, where the token
count is H*W of the coarsest pyramid level (e.g. 40x40 = 1600 tokens at 1280 px) —
large enough that materializing the (N, N) score matrix in HBM wastes bandwidth.

Design (pallas_guide.md):
  * Grid: (batch * heads, N / BLOCK_Q). Each program owns one query tile.
  * K and V for the (batch, head) live in VMEM whole (N x hd <= 2048 x 128 f32 =
    1 MB) — no second-level pipeline needed at detection-head sizes.
  * Online softmax: running max m, running sum l, accumulator acc over KV tiles —
    scores never touch HBM. MXU does the two matmuls per tile; VPU the rescaling.
  * All matmuls request preferred_element_type=float32 for MXU accuracy.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float,
                  valid_len: int):
    """Blocks as delivered: q (1, BQ, hd); k, v (1, N, hd); o (1, BQ, hd).

    valid_len masks zero-padded keys (index >= valid_len get -inf scores) so callers
    can pad token counts up to a 128 multiple without changing the attention result.
    """
    q = q_ref[0] * scale
    N = k_ref.shape[1]
    hd = q.shape[1]
    bq = q.shape[0]

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, hd), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k_tile = k_ref[0, pl.ds(j * block_k, block_k), :]
        v_tile = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK)
        if valid_len < N:
            key_idx = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1
            )
            s = jnp.where(key_idx < valid_len, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v_tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, N // block_k, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret", "valid_len", "scale")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
    valid_len: int = -1,
    scale: float = -1.0,
) -> jnp.ndarray:
    """Fused softmax(q k^T * scale) v over (B, N, hd) arrays (B = batch*heads).

    N must be a multiple of block_q and block_k. To use arbitrary token counts,
    zero-pad to a 128 multiple and pass the true count as `valid_len` (padded keys
    are masked inside the kernel; padded query rows return zeros). `scale` defaults
    to hd**-0.5 — pass the true head dim's scale when hd itself is zero-padded.
    """
    B, N, hd = q.shape
    assert N % block_q == 0 and N % block_k == 0, (N, block_q, block_k)
    if valid_len < 0:
        valid_len = N
    if scale <= 0.0:
        scale = hd**-0.5

    grid = (B, N // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale,
                          valid_len=valid_len),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, hd), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out


def _padded_flash_impl(q, k, v, interpret: bool):
    B, N, hd = q.shape
    n_pad = (-N) % 128
    h_pad = (-hd) % 128
    if n_pad == 0 and h_pad == 0:
        return flash_attention(q, k, v, interpret=interpret)
    pad = ((0, 0), (0, n_pad), (0, h_pad))
    qp = jnp.pad(q, pad)
    kp = jnp.pad(k, pad)
    vp = jnp.pad(v, pad)
    out = flash_attention(qp, kp, vp, interpret=interpret, valid_len=N,
                          scale=hd**-0.5)
    return out[:, :N, :hd]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _padded_flash_vjp(q, k, v, interpret: bool):
    return _padded_flash_impl(q, k, v, interpret)


def _padded_flash_fwd(q, k, v, interpret: bool):
    return _padded_flash_impl(q, k, v, interpret), (q, k, v)


def _padded_flash_bwd(interpret, residuals, g):
    """Exact softmax-attention backward, recomputed with einsums (f32).

    The Pallas forward kernel has no transpose rule; without this VJP, training a
    transformer variant on TPU at >= 256 tokens crashed in jax.grad (ADVICE round 2,
    medium). The recompute materializes the (N, N) score matrix per (batch*head) —
    fine at detection-head token counts (<= 1600 @1280px) and only on the backward
    pass, where XLA schedules it alongside the other gradient matmuls.
    """
    q, k, v = residuals
    hd = q.shape[-1]
    scale = hd**-0.5
    s = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bqk,bqc->bkc", p, g32)
    dp = jnp.einsum("bqc,bkc->bqk", g32, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bqk,bkc->bqc", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bqk,bqc->bkc", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_padded_flash_vjp.defvjp(_padded_flash_fwd, _padded_flash_bwd)


def padded_flash_attention(q, k, v, interpret: bool = False):
    """flash_attention for arbitrary (B, N, hd): zero-pads N to a 128 multiple and
    hd to 128 lanes, masks the pad inside the kernel, and slices the output back.

    Zero-padding hd is exact: q.k logits are unchanged by zero lanes and the padded
    v lanes produce zero output columns, which are sliced off. This is what lets the
    transformer-enhanced P5 head (400 tokens @640px, 1600 @1280px) run on the fused
    kernel instead of materializing (N, N) score matrices (reference attention.py:244-309).

    Differentiable: a custom VJP recomputes the exact attention backward with
    einsums, so the flash forward is safe inside jax.grad (training included).
    """
    return _padded_flash_vjp(q, k, v, interpret)


def attention_reference(q, k, v):
    """Naive attention for testing: softmax(q k^T / sqrt(hd)) v."""
    hd = q.shape[-1]
    s = jnp.einsum("bqc,bkc->bqk", q, k) * hd**-0.5
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkc->bqc", p, v)
