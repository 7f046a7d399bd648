"""Encoder-side ASPP / eASPP stage modules.

Parity targets:
  - ASPP with out_channels == in_channels applied to each stage's fused output
    (reference dual_segformer_w_aspp.py:48-83,398-402,451-505; rates
    [3,6,9]/[6,12,18]/[12,24,36]/[12,24,36])
  - eASPP (AdapNet++-style cascaded bottleneck branches) applied only after
    stage 4 (reference dual_segformer_w_ef_aspp.py:48-159,476-477)

Module naming tracks the torch attribute paths exactly (nested module where
torch nests one, flattened names for bare Sequential indices) so the generic
converter maps checkpoints 1:1.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rgbx_semantic_segmentation_tpu.ops import layers as L

Dtype = Any

STAGE_ASPP_RATES = ((3, 6, 9), (6, 12, 18), (12, 24, 36), (12, 24, 36))


class ASPPConvBranch(nn.Module):
    """Dilated 3x3 conv + BN + ReLU branch; torch names block.0/block.1
    (reference ASPPConv, dual_segformer_w_aspp.py:18-28)."""

    features: int
    rate: int
    bn_momentum: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.rate
        y = nn.Conv(self.features, (3, 3), padding=((p, p), (p, p)),
                    kernel_dilation=(self.rate, self.rate), use_bias=False,
                    dtype=self.dtype, kernel_init=L.conv_kaiming_init(),
                    name="block_0")(x)
        y = L.batch_norm(self.bn_momentum, dtype=self.dtype, name="block_1")(
            y, use_running_average=not train)
        return nn.relu(y)


class GapBranch(nn.Module):
    """AdaptiveAvgPool(1) + 1x1 conv + BN + ReLU, broadcast back (reference
    AsppPooling; align_corners=True upsample of a 1x1 map == broadcast)."""

    features: int
    bn_momentum: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.Conv(self.features, (1, 1), use_bias=False,
                         dtype=self.dtype, kernel_init=L.conv_kaiming_init(),
                         name="gap_1")(pooled)
        pooled = L.batch_norm(self.bn_momentum, dtype=self.dtype,
                              name="gap_2")(pooled,
                                            use_running_average=not train)
        pooled = nn.relu(pooled)
        return jnp.broadcast_to(
            pooled, pooled.shape[:1] + x.shape[1:3] + pooled.shape[3:])


def _inline_cbr(mod, x, features, kernel, conv_name, bn_name, bn_momentum,
                dtype, train):
    """conv+BN+ReLU registered directly on the caller's scope (for torch bare
    Sequential indices like project.0/project.1)."""
    p = kernel // 2
    y = nn.Conv(features, (kernel, kernel), padding=((p, p), (p, p)),
                use_bias=False, dtype=dtype,
                kernel_init=L.conv_kaiming_init(), name=conv_name)(x)
    y = L.batch_norm(bn_momentum, dtype=dtype, name=bn_name)(
        y, use_running_average=not train)
    return nn.relu(y)


class StageASPP(nn.Module):
    """ASPP keeping channel count (reference dual_segformer_w_aspp.py:48-83)."""

    in_channels: int
    rates: Tuple[int, int, int]
    bn_momentum: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = self.in_channels
        feats = [_inline_cbr(self, x, C, 1, "b0_0", "b0_1",
                             self.bn_momentum, self.dtype, train)]
        for bi, rate in enumerate(self.rates, start=1):
            feats.append(ASPPConvBranch(C, rate, self.bn_momentum,
                                        self.dtype, name=f"b{bi}")(x, train))
        feats.append(GapBranch(C, self.bn_momentum, self.dtype,
                               name="b4")(x, train))
        y = jnp.concatenate(feats, axis=-1)
        y = _inline_cbr(self, y, C, 1, "project_0", "project_1",
                        self.bn_momentum, self.dtype, train)
        return nn.Dropout(0.5, deterministic=not train)(y)


class EASPP(nn.Module):
    """Efficient ASPP: 3 cascaded-3x3 bottleneck branches (64ch) -> 256, plus
    input 1x1 and image pooling, concat 5x256 -> project back to in_channels
    (reference dual_segformer_w_ef_aspp.py:48-159)."""

    in_channels: int
    rates: Tuple[int, int, int] = (12, 24, 36)
    reduce_dim: int = 64
    middle_dim: int = 256
    bn_momentum: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mm = (self.bn_momentum, self.dtype)
        x_in = _inline_cbr(self, x, self.middle_dim, 1, "input_conv_0",
                           "input_conv_1", *mm, train)
        branches = [x_in]
        for bi, rate in enumerate(self.rates, start=1):
            b = _inline_cbr(self, x, self.reduce_dim, 1,
                            f"branch{bi}_0_0", f"branch{bi}_0_1", *mm, train)
            for ci in (1, 2, 3):
                b = ASPPConvBranch(self.reduce_dim, rate, self.bn_momentum,
                                   self.dtype,
                                   name=f"branch{bi}_{ci}")(b, train)
            b = _inline_cbr(self, b, self.middle_dim, 1,
                            f"branch{bi}_4_0", f"branch{bi}_4_1", *mm, train)
            branches.append(b)
        branches.append(GapBranch(self.middle_dim, self.bn_momentum,
                                  self.dtype, name="img_pooling")(x, train))
        y = jnp.concatenate(branches, axis=-1)
        y = _inline_cbr(self, y, self.in_channels, 1, "project_0",
                        "project_1", *mm, train)
        return nn.Dropout(0.5, deterministic=not train)(y)
