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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    """Blocks as delivered: q (1, BQ, hd); k, v (1, N, hd); o (1, BQ, hd)."""
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
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused softmax(q k^T / sqrt(hd)) v over (B, N, hd) arrays (B = batch*heads).

    N must be a multiple of block_q and block_k (pad tokens with zeros and mask at
    the caller if needed; detection-head grids are powers of two).
    """
    B, N, hd = q.shape
    assert N % block_q == 0 and N % block_k == 0, (N, block_q, block_k)
    scale = hd**-0.5

    grid = (B, N // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
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


def attention_reference(q, k, v):
    """Naive attention for testing: softmax(q k^T / sqrt(hd)) v."""
    hd = q.shape[-1]
    s = jnp.einsum("bqc,bkc->bqk", q, k) * hd**-0.5
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkc->bqc", p, v)
