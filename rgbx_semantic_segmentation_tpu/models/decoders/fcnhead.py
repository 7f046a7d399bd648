"""FCN head: 3x3 conv + BN + ReLU -> 1x1 classifier.

Parity target: reference `models/decoders/fcnhead.py:9-29`. Used both as the aux
head on feature index 2 (reference builder.py:166-179) and as the "no decoder"
FCN-32s fallback on the last feature (builder.py:186-189).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from rgbx_semantic_segmentation_tpu.ops import layers as L


class FCNHead(nn.Module):
    num_classes: int
    in_index: int = 2
    channels: Optional[int] = None  # default in_channels // 4 (fcnhead.py:15)
    kernel_size: int = 3
    dilation: int = 1
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inputs: Union[Sequence[jnp.ndarray], jnp.ndarray],
                 train: bool = False):
        x = inputs[self.in_index] if isinstance(inputs, (list, tuple)) else inputs
        in_ch = x.shape[-1]
        mid = self.channels or in_ch // 4
        p = (self.kernel_size // 2) * self.dilation
        x = L.conv(mid, self.kernel_size, padding=((p, p), (p, p)),
                   dtype=self.dtype, name="conv_0")(x)
        x = L.batch_norm(self.bn_momentum, self.bn_eps, dtype=self.dtype,
                         name="conv_1")(x, use_running_average=not train)
        x = nn.relu(x)
        return L.conv(self.num_classes, 1, dtype=self.dtype,
                      name="classifier")(x)
