"""All-MLP SegFormer decode head.

Parity target: reference `models/decoders/MLPDecoder.py:22-81` — per-scale Linear
to embed_dim, bilinear-upsample c2-c4 to c1 (1/4) resolution, concat, 1x1 conv +
BN + ReLU fuse, Dropout2d, 1x1 classifier.

TPU-first fuse: the 1x1 fuse conv over concat([c4,c3,c2,c1]) distributes over
the concat, and bilinear resize is channelwise-linear so it commutes with the
per-scale matmul. SlicedFuse therefore applies each scale's kernel slice at
that scale's NATIVE resolution and upsamples the E-channel result — exact same
math, but the fuse matmul runs on 1 + 1/4 + 1/16 + 1/64 of the pixels instead
of 4x full-res and the 4E-channel concat buffer (630 MB at b8 480x640) never
materialises. The parameter tree is unchanged (kernel (1,1,4E,E) + bias under
`linear_fuse_0`), so checkpoint/convert contracts hold.
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


class SlicedFuse(nn.Module):
    """1x1 conv over a virtual concat, evaluated per input at native
    resolution before upsampling. Params identical to L.conv(embed_dim, 1)
    applied to the concat (kernel HWIO (1, 1, n*E, E), zero bias)."""

    embed_dim: int
    n_inputs: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, embeds: Sequence[jnp.ndarray], size):
        E = self.embed_dim
        kernel = self.param("kernel", L.conv_kaiming_init(1),
                            (1, 1, self.n_inputs * E, E))
        bias = self.param("bias", nn.initializers.zeros, (E,))
        cdtype = self.dtype or jnp.float32
        acc = None
        for i, e in enumerate(embeds):
            wi = kernel[0, 0, i * E:(i + 1) * E, :].astype(cdtype)
            y = jnp.einsum("bhwc,cd->bhwd", e.astype(cdtype), wi,
                           preferred_element_type=jnp.float32).astype(cdtype)
            if tuple(y.shape[1:3]) != tuple(size):
                y = resize_bilinear(y, size)
            acc = y if acc is None else acc + y
        return acc + bias.astype(cdtype)


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
        # Reference concat order is [c4, c3, c2, c1] (MLPDecoder.py:77).
        embeds = [
            MLPEmbed(self.embed_dim, self.dtype, name="linear_c4")(c4),
            MLPEmbed(self.embed_dim, self.dtype, name="linear_c3")(c3),
            MLPEmbed(self.embed_dim, self.dtype, name="linear_c2")(c2),
            MLPEmbed(self.embed_dim, self.dtype, name="linear_c1")(c1),
        ]
        x = SlicedFuse(self.embed_dim, 4, dtype=self.dtype,
                       name="linear_fuse_0")(embeds, size)
        x = L.batch_norm(self.bn_momentum, self.bn_eps, dtype=self.dtype,
                         name="linear_fuse_1")(x, use_running_average=not train)
        x = nn.relu(x)
        # torch Dropout2d drops whole channel maps: broadcast over H, W.
        x = nn.Dropout(self.dropout_ratio, broadcast_dims=(1, 2),
                       deterministic=not train)(x)
        x = L.conv(self.num_classes, 1, dtype=self.dtype, name="linear_pred")(x)
        return x
