"""MLPDecoder++ : conv embeddings + GELU fuse + SE-style global attention gate.

Parity target: reference `models/decoders/MLPDecoderpp.py:22-89`.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from rgbx_semantic_segmentation_tpu.ops import layers as L
from rgbx_semantic_segmentation_tpu.ops.resize import resize_bilinear

Dtype = Any


class MLPDecoderpp(nn.Module):
    num_classes: int
    embed_dim: int = 512
    dropout_ratio: float = 0.1
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        c1, c2, c3, c4 = inputs
        size = c1.shape[1:3]
        _c1 = L.conv(self.embed_dim, 1, dtype=self.dtype, name="linear_c1")(c1)
        _c2 = resize_bilinear(
            L.conv(self.embed_dim, 1, dtype=self.dtype, name="linear_c2")(c2),
            size)
        _c3 = resize_bilinear(
            L.conv(self.embed_dim, 1, dtype=self.dtype, name="linear_c3")(c3),
            size)
        _c4 = resize_bilinear(
            L.conv(self.embed_dim, 1, dtype=self.dtype, name="linear_c4")(c4),
            size)
        # Reference concat order here is [c1, c2, c3, c4] (MLPDecoderpp.py:80).
        fused = jnp.concatenate([_c1, _c2, _c3, _c4], axis=-1)
        fused = L.conv(self.embed_dim, 1, dtype=self.dtype,
                       name="linear_fuse_0")(fused)
        fused = L.batch_norm(self.bn_momentum, self.bn_eps, dtype=self.dtype,
                             name="linear_fuse_1")(
            fused, use_running_average=not train)
        fused = nn.gelu(fused, approximate=False)
        # SE-style global gate (MLPDecoderpp.py:55-61,80-82).
        att = jnp.mean(fused, axis=(1, 2), keepdims=True)
        att = L.conv(self.embed_dim // 4, 1, dtype=self.dtype,
                     name="attention_1")(att)
        att = nn.gelu(att, approximate=False)
        att = L.conv(self.embed_dim, 1, dtype=self.dtype,
                     name="attention_3")(att)
        att = nn.sigmoid(att)
        fused = fused * att
        fused = nn.Dropout(self.dropout_ratio, broadcast_dims=(1, 2),
                           deterministic=not train)(fused)
        return L.conv(self.num_classes, 1, dtype=self.dtype,
                      name="linear_pred")(fused)
