"""All-MLP SegFormer decode head.

Parity target: reference `models/decoders/MLPDecoder.py:22-81` — per-scale Linear
to embed_dim, bilinear-upsample c2-c4 to c1 (1/4) resolution, concat, 1x1 conv +
BN + ReLU fuse, Dropout2d, 1x1 classifier.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from rgbx_semantic_segmentation_tpu.ops import layers as L
from rgbx_semantic_segmentation_tpu.ops.resize import resize_bilinear

Dtype = Any


class MLPEmbed(nn.Module):
    """Linear embedding of one scale (reference MLPDecoder.py:8-19)."""

    embed_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        # NHWC: the token flatten/transpose of the reference is a no-op here.
        return L.dense(self.embed_dim, dtype=self.dtype, name="proj")(x)


class MLPDecoder(nn.Module):
    """reference MLPDecoder.py DecoderHead. Input: 4 NHWC maps
    [1/4, 1/8, 1/16, 1/32]; output logits at 1/4 resolution."""

    num_classes: int
    embed_dim: int = 768
    dropout_ratio: float = 0.1
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        c1, c2, c3, c4 = inputs
        size = c1.shape[1:3]
        _c4 = resize_bilinear(
            MLPEmbed(self.embed_dim, self.dtype, name="linear_c4")(c4), size)
        _c3 = resize_bilinear(
            MLPEmbed(self.embed_dim, self.dtype, name="linear_c3")(c3), size)
        _c2 = resize_bilinear(
            MLPEmbed(self.embed_dim, self.dtype, name="linear_c2")(c2), size)
        _c1 = MLPEmbed(self.embed_dim, self.dtype, name="linear_c1")(c1)
        # Reference concat order is [c4, c3, c2, c1] (MLPDecoder.py:77).
        x = jnp.concatenate([_c4, _c3, _c2, _c1], axis=-1)
        x = L.conv(self.embed_dim, 1, dtype=self.dtype, name="linear_fuse_0")(x)
        x = L.batch_norm(self.bn_momentum, self.bn_eps, dtype=self.dtype,
                         name="linear_fuse_1")(x, use_running_average=not train)
        x = nn.relu(x)
        # torch Dropout2d drops whole channel maps: broadcast over H, W.
        x = nn.Dropout(self.dropout_ratio, broadcast_dims=(1, 2),
                       deterministic=not train)(x)
        x = L.conv(self.num_classes, 1, dtype=self.dtype, name="linear_pred")(x)
        return x
