"""UPerNet decode head: PPM pyramid + FPN top-down fusion.

Parity target: reference `models/decoders/UPernet.py:8-146` — PPM pool scales
(1,2,3,6) on c4, 1x1 lateral convs + top-down adds, per-level 3x3 fpn convs,
concat of all levels at 1/4 resolution -> 3x3 bottleneck -> classifier. Paired
with an aux FCNHead by the builder (reference builder.py:166-170).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rgbx_semantic_segmentation_tpu.ops import layers as L
from rgbx_semantic_segmentation_tpu.ops.resize import (
    adaptive_avg_pool, resize_bilinear)

Dtype = Any


class UPerHead(nn.Module):
    in_channels: Tuple[int, ...] = (96, 192, 384, 768)
    num_classes: int = 40
    channels: int = 512
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)
    dropout_ratio: float = 0.1
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: Optional[Dtype] = None

    def _conv_bn_relu(self, x, features, ksize, name, train):
        p = ksize // 2
        x = L.conv(features, ksize, padding=((p, p), (p, p)), dtype=self.dtype,
                   name=f"{name}_0")(x)
        x = L.batch_norm(self.bn_momentum, self.bn_eps, dtype=self.dtype,
                         name=f"{name}_1")(x, use_running_average=not train)
        return nn.relu(x)

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        c4 = inputs[-1]
        size4 = c4.shape[1:3]
        # PSP module on c4 (reference UPernet.py:58-66,107-146).
        psp_outs = [c4]
        for i, scale in enumerate(self.pool_scales):
            y = adaptive_avg_pool(c4, (scale, scale))
            y = L.conv(self.channels, 1, dtype=self.dtype,
                       name=f"psp_modules_{i}_1")(y)
            y = L.batch_norm(self.bn_momentum, self.bn_eps, dtype=self.dtype,
                             name=f"psp_modules_{i}_2")(
                y, use_running_average=not train)
            y = nn.relu(y)
            psp_outs.append(resize_bilinear(y, size4))
        psp = self._conv_bn_relu(jnp.concatenate(psp_outs, axis=-1),
                                 self.channels, 3, "bottleneck", train)

        # FPN laterals (reference UPernet.py:68-84).
        laterals = []
        for i in range(len(self.in_channels) - 1):
            laterals.append(self._conv_bn_relu(
                inputs[i], self.channels, 1, f"lateral_convs_{i}", train))
        laterals.append(psp)
        for i in range(len(laterals) - 1, 0, -1):
            prev_hw = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + resize_bilinear(
                laterals[i], prev_hw)

        # Per-level output convs + multi-level concat (UPernet.py:86-102).
        fpn_outs = []
        for i in range(len(laterals) - 1):
            fpn_outs.append(self._conv_bn_relu(
                laterals[i], self.channels, 3, f"fpn_convs_{i}", train))
        fpn_outs.append(laterals[-1])
        size0 = fpn_outs[0].shape[1:3]
        fpn_outs = [fpn_outs[0]] + [resize_bilinear(f, size0)
                                    for f in fpn_outs[1:]]
        out = self._conv_bn_relu(jnp.concatenate(fpn_outs, axis=-1),
                                 self.channels, 3, "fpn_bottleneck", train)
        return L.conv(self.num_classes, 1, dtype=self.dtype,
                      name="conv_seg")(out)
