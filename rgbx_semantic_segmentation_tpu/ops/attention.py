"""Attention compute paths.

The MiT encoder's spatial-reduction attention (reference dual_segformer.py:77-138)
is the hot op. The default path below is pure XLA (einsum chains fuse well on the
MXU); `ops/pallas_attention.py` provides a fused Pallas kernel the encoder can
dispatch to for large token counts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         scale: float,
                         use_pallas: bool = False) -> jnp.ndarray:
    """Softmax attention. q: (B, h, N, d); k, v: (B, h, M, d) -> (B, N, h*d).

    Logits and softmax accumulate in fp32 (bf16 inputs stay bf16 on the MXU).
    With use_pallas (and supported shapes/backend), dispatches to the fused
    Pallas kernel that keeps the (N x M) probs in VMEM.
    """
    if use_pallas:
        from rgbx_semantic_segmentation_tpu.ops import pallas_attention as pa
        if pa.supported(q.shape, k.shape):
            return pa.sr_attention_pallas(q, k, v, scale)
    B, h, N, d = q.shape
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype).transpose(0, 2, 1, 3).reshape(B, N, h * d)
