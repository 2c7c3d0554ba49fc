"""Pallas TPU kernels for the hot ops: NMS, fused attention."""
from .attention_kernel import attention_reference, flash_attention
from .nms_kernel import (
    pallas_backend_ok,
    pallas_batched_greedy_nms,
    pallas_greedy_nms,
)

__all__ = [
    "attention_reference",
    "flash_attention",
    "pallas_backend_ok",
    "pallas_batched_greedy_nms",
    "pallas_greedy_nms",
]
