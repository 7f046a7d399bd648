"""DeepLabV3+ decode head.

Parity target: reference `models/decoders/deeplabv3plus.py:6-98` — ASPP with
atrous rates (12,24,36) + image pooling on c4, a 48-channel low-level branch on
c1, concat -> 3x3 -> dropout -> classifier. Uses align_corners=True resizes
(deeplabv3plus.py:32,63), unlike every other head.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rgbx_semantic_segmentation_tpu.ops import layers as L
from rgbx_semantic_segmentation_tpu.ops.resize import (
    resize_bilinear_align_corners)

Dtype = Any


class ASPPConv(nn.Module):
    """3x3 atrous conv + BN + ReLU branch (reference deeplabv3plus.py:37-47)."""

    out_channels: int
    rate: int
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.out_channels, (3, 3),
                    padding=((self.rate, self.rate), (self.rate, self.rate)),
                    kernel_dilation=(self.rate, self.rate), use_bias=False,
                    dtype=self.dtype, kernel_init=L.conv_kaiming_init(),
                    name="block_0")(x)
        y = L.batch_norm(self.bn_momentum, self.bn_eps, dtype=self.dtype,
                         name="block_1")(y, use_running_average=not train)
        return nn.relu(y)


class AsppPooling(nn.Module):
    """Global-average image pooling branch (reference deeplabv3plus.py:50-64)."""

    out_channels: int
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = L.conv(self.out_channels, 1, use_bias=False, dtype=self.dtype,
                        name="gap_1")(pooled)
        pooled = L.batch_norm(self.bn_momentum, self.bn_eps, dtype=self.dtype,
                              name="gap_2")(pooled,
                                            use_running_average=not train)
        pooled = nn.relu(pooled)
        # align_corners=True upsample of a 1x1 map == broadcast.
        return jnp.broadcast_to(
            pooled, pooled.shape[:1] + x.shape[1:3] + pooled.shape[3:])


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference deeplabv3plus.py:67-98)."""

    atrous_rates: Tuple[int, int, int] = (12, 24, 36)
    out_channels: int = 256
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                  dtype=self.dtype)
        y = L.conv(self.out_channels, 1, use_bias=False, dtype=self.dtype,
                   name="b0_0")(x)
        y = L.batch_norm(self.bn_momentum, self.bn_eps, dtype=self.dtype,
                         name="b0_1")(y, use_running_average=not train)
        feats = [nn.relu(y)]
        for bi, rate in enumerate(self.atrous_rates, start=1):
            feats.append(ASPPConv(self.out_channels, rate, **kw,
                                  name=f"b{bi}")(x, train))
        feats.append(AsppPooling(self.out_channels, **kw, name="b4")(x, train))
        y = jnp.concatenate(feats, axis=-1)
        y = L.conv(self.out_channels, 1, use_bias=False, dtype=self.dtype,
                   name="project_0")(y)
        y = L.batch_norm(self.bn_momentum, self.bn_eps, dtype=self.dtype,
                         name="project_1")(y, use_running_average=not train)
        y = nn.relu(y)
        return nn.Dropout(0.5, deterministic=not train)(y)


class DeepLabV3Plus(nn.Module):
    in_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    num_classes: int = 40
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        c1, _, _, c4 = inputs
        low = L.conv(48, 3, padding=((1, 1), (1, 1)), dtype=self.dtype,
                     name="low_level_0")(c1)
        low = L.batch_norm(self.bn_momentum, self.bn_eps, dtype=self.dtype,
                           name="low_level_1")(low,
                                               use_running_average=not train)
        low = nn.relu(low)
        y = ASPP(bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                 dtype=self.dtype, name="aspp")(c4, train)
        y = resize_bilinear_align_corners(y, low.shape[1:3])
        y = jnp.concatenate([y, low], axis=-1)
        y = L.conv(256, 3, padding=((1, 1), (1, 1)), dtype=self.dtype,
                   name="block_0")(y)
        y = L.batch_norm(self.bn_momentum, self.bn_eps, dtype=self.dtype,
                         name="block_1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Dropout(0.1, deterministic=not train)(y)
        return L.conv(self.num_classes, 1, dtype=self.dtype, name="block_4")(y)
