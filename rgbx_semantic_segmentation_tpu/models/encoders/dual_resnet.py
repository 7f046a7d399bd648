"""Dual-branch ResNet encoder.

Parity target: reference `models/encoders/dual_resnet.py` — two torchvision
ResNets (fc stripped) with FRM+FFM after each of layer1-4, dims
(256, 512, 1024, 2048), FFM heads (4, 8, 16, 32) (reference :43-52,68-91).

The ResNet towers replicate torchvision's bottleneck architecture with matching
parameter naming (conv1/bn1/layer{1-4}.{i}.conv{1-3}/bn{1-3}/downsample.{0,1})
so ImageNet torchvision checkpoints convert directly; the dual-path loader
duplicates backbone.* -> backbone_d.* like the reference (:102-138).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

from flax import linen as nn

from rgbx_semantic_segmentation_tpu.models import fusion
from rgbx_semantic_segmentation_tpu.ops import layers as L

Dtype = Any


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + residual."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    bn_momentum: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return L.batch_norm(self.bn_momentum, dtype=self.dtype, name=name)

        identity = x
        y = L.conv(self.planes, 1, use_bias=False, dtype=self.dtype,
                   name="conv1")(x)
        y = nn.relu(bn("bn1")(y, use_running_average=not train))
        y = L.conv(self.planes, 3, stride=self.stride,
                   padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                   name="conv2")(y)
        y = nn.relu(bn("bn2")(y, use_running_average=not train))
        y = L.conv(self.planes * 4, 1, use_bias=False, dtype=self.dtype,
                   name="conv3")(y)
        y = bn("bn3")(y, use_running_average=not train)
        if self.has_downsample:
            identity = L.conv(self.planes * 4, 1, stride=self.stride,
                              use_bias=False, dtype=self.dtype,
                              name="downsample_0")(x)
            identity = L.batch_norm(self.bn_momentum, dtype=self.dtype,
                                    name="downsample_1")(
                identity, use_running_average=not train)
        return nn.relu(y + identity)


class ResNetTower(nn.Module):
    """One torchvision-style ResNet trunk emitting layer1-4 features."""

    layers: Sequence[int] = (3, 4, 6, 3)
    bn_momentum: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = L.conv(64, 7, stride=2, padding=((3, 3), (3, 3)),
                   use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = L.batch_norm(self.bn_momentum, dtype=self.dtype, name="bn1")(
            x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        planes = (64, 128, 256, 512)
        for li, (p, depth) in enumerate(zip(planes, self.layers), start=1):
            for bi in range(depth):
                stride = 2 if (li > 1 and bi == 0) else 1
                x = Bottleneck(p, stride=stride, has_downsample=(bi == 0),
                               bn_momentum=self.bn_momentum, dtype=self.dtype,
                               name=f"layer{li}_{bi}")(x, train)
            feats.append(x)
        return feats


class DualResNet(nn.Module):
    """Two ResNet towers + per-stage FRM/FFM (reference dual_resnet.py:16-92)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    frm: str = "FRM"
    ffm: str = "FFM"
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x_rgb, x_d, train: bool = False):
        frm_cls = fusion.get_frm(self.frm)
        ffm_cls = fusion.get_ffm(self.ffm)
        f_rgb = ResNetTower(self.layers, self.bn_momentum, dtype=self.dtype,
                            name="backbone")(x_rgb, train)
        f_d = ResNetTower(self.layers, self.bn_momentum, dtype=self.dtype,
                          name="backbone_d")(x_d, train)
        dims = (256, 512, 1024, 2048)
        heads = (4, 8, 16, 32)
        outs = []
        for i in range(4):
            r, d = frm_cls(dim=dims[i], reduction=1, dtype=self.dtype,
                           name=f"frm{i + 1}")(f_rgb[i], f_d[i], train)
            outs.append(ffm_cls(dim=dims[i], reduction=1, num_heads=heads[i],
                                bn_momentum=self.bn_momentum,
                                bn_eps=self.bn_eps, dtype=self.dtype,
                                name=f"ffm{i + 1}")(r, d, train))
        return outs


def dual_resnet50(**kw):
    return DualResNet(layers=(3, 4, 6, 3), **kw)


def dual_resnet101(**kw):
    return DualResNet(layers=(3, 4, 23, 3), **kw)


def dual_resnet152(**kw):
    return DualResNet(layers=(3, 8, 36, 3), **kw)


CHANNELS = {
    "dual_resnet50": (256, 512, 1024, 2048),
    "dual_resnet101": (256, 512, 1024, 2048),
    "dual_resnet152": (256, 512, 1024, 2048),
}
