"""Dual-branch SegNeXt encoder (MSCA conv attention).

Parity target: reference `models/encoders/dual_segnext.py` — conv stem (4x4
stride 4), per-stage MSCA blocks (depthwise 5x5 + strip convs 1x7/7x1, 1x11/11x1,
1x21/21x1, gated by a 1x1 mixer, reference :226-246), LayerScale + stochastic
depth (:67-130), 3x3-stride-2 downsampling between stages, per-stage BN norm then
IFRM/IFFM fusion (:315-353).

The reference implementation is non-functional as written: it passes stage dims
as DownSample's (kernelSize, stride) positional args (:312-313, crashing at
runtime), appends the SAME Block objects to both towers (:307-308, silently
weight-tying them), and `myLayerNorm.__init__` uses `==` instead of `=` (:27).
This rebuild implements the intended architecture: working DownSample
(k=3, s=2, dims[i] -> dims[i+1]) and independent towers, with the dual-path
pretrained loader duplicating single-tower weights like the other encoders.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
from flax import linen as nn

from rgbx_semantic_segmentation_tpu.models import fusion
from rgbx_semantic_segmentation_tpu.ops import layers as L

Dtype = Any

# SyncBN momentum 3e-4 (reference dual_segnext.py:17,22, torch convention).
BN_MOMENTUM = 3e-4


class MSCA(nn.Module):
    """Multi-scale conv attention (reference dual_segnext.py:226-246)."""

    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        d = self.dim

        def dw(k, name):
            kh, kw = k if isinstance(k, tuple) else (k, k)
            return L.conv(d, (kh, kw), padding=((kh // 2, kh // 2),
                                                (kw // 2, kw // 2)),
                          groups=d, dtype=self.dtype, name=name)

        skip = x
        c55 = dw(5, "conv55")(x)
        c17 = dw((7, 1), "conv17_1")(dw((1, 7), "conv17_0")(x))
        c111 = dw((11, 1), "conv111_1")(dw((1, 11), "conv111_0")(x))
        c211 = dw((21, 1), "conv211_1")(dw((1, 21), "conv211_0")(x))
        mixer = L.conv(d, 1, dtype=self.dtype, name="conv11")(
            c55 + c17 + c111 + c211)
        return mixer * skip


class SegNextBlock(nn.Module):
    """MSCA block: BN -> MSCA -> LayerScale -> droppath, then BN -> conv-FFN
    (reference dual_segnext.py:263-279)."""

    dim: int
    ffn_ratio: float = 4.0
    ls_init: float = 1e-2
    drop_path: float = 0.0
    bn_momentum: float = BN_MOMENTUM
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dp = L.DropPath(self.drop_path, name="drop_path")
        y = L.batch_norm(self.bn_momentum, dtype=self.dtype, name="norm1")(
            x, use_running_average=not train)
        y = MSCA(self.dim, dtype=self.dtype, name="attn")(y)
        ls1 = self.param("ls1_layer_scale",
                         nn.initializers.constant(self.ls_init), (self.dim,))
        x = x + dp(y * ls1.astype(y.dtype), deterministic=not train)
        y = L.batch_norm(self.bn_momentum, dtype=self.dtype, name="norm2")(
            x, use_running_average=not train)
        hid = int(self.dim * self.ffn_ratio)
        y = L.conv(hid, 1, dtype=self.dtype, name="ffn_fc1")(y)
        y = L.conv(hid, 3, padding=((1, 1), (1, 1)), groups=hid,
                   dtype=self.dtype, name="ffn_dwconv")(y)
        y = nn.gelu(y, approximate=False)
        y = L.conv(self.dim, 1, dtype=self.dtype, name="ffn_fc2")(y)
        ls2 = self.param("ls2_layer_scale",
                         nn.initializers.constant(self.ls_init), (self.dim,))
        return x + dp(y * ls2.astype(y.dtype), deterministic=not train)


class SegNextEncoder(nn.Module):
    """Dual-tower SegNeXt with IFRM/IFFM fusion (reference :281-353)."""

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    ls_init: float = 1e-2
    frm: str = "IFRM"  # reference hardwires the Improved modules (:315-321)
    ffm: str = "IFFM"
    bn_momentum: float = BN_MOMENTUM
    bn_eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x_rgb, x_e, train: bool = False):
        dpr = [float(v) for v in
               np.linspace(0, self.drop_path_rate, sum(self.depths))]
        frm_cls = fusion.get_frm(self.frm)
        ffm_cls = fusion.get_ffm(self.ffm)

        def stem(x, prefix):
            x = L.conv(self.dims[0], 4, stride=4, padding="VALID",
                       dtype=self.dtype, name=f"{prefix}_0")(x)
            return L.batch_norm(self.bn_momentum, dtype=self.dtype,
                                name=f"{prefix}_1")(
                x, use_running_average=not train)

        x_rgb = stem(x_rgb, "stem")
        x_e = stem(x_e, "extra_stem")

        outs = []
        cur = 0
        for i in range(4):
            for j in range(self.depths[i]):
                kw = dict(dim=self.dims[i], ls_init=self.ls_init,
                          drop_path=dpr[cur + j],
                          bn_momentum=self.bn_momentum, dtype=self.dtype)
                x_rgb = SegNextBlock(**kw, name=f"stages_{i}_{j}")(x_rgb, train)
                x_e = SegNextBlock(**kw, name=f"extra_stages_{i}_{j}")(
                    x_e, train)
            cur += self.depths[i]

            n = L.batch_norm(self.bn_momentum, dtype=self.dtype,
                             name=f"norm_{i}")(
                x_rgb, use_running_average=not train)
            n_e = L.batch_norm(self.bn_momentum, dtype=self.dtype,
                               name=f"extra_norm_{i}")(
                x_e, use_running_average=not train)
            n, n_e = frm_cls(dim=self.dims[i], reduction=1, dtype=self.dtype,
                             name=f"FRMs_{i}")(n, n_e, train)
            fused = ffm_cls(dim=self.dims[i], reduction=1, num_heads=8,
                            bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                            dtype=self.dtype, name=f"FFMs_{i}")(n, n_e, train)
            outs.append(fused)

            if i < 3:
                x_rgb = L.conv(self.dims[i + 1], 3, stride=2,
                               padding=((1, 1), (1, 1)), dtype=self.dtype,
                               name=f"downsample_{i}")(x_rgb)
                x_e = L.conv(self.dims[i + 1], 3, stride=2,
                             padding=((1, 1), (1, 1)), dtype=self.dtype,
                             name=f"extra_downsample_{i}")(x_e)
        return outs


def segnext_tiny(**kw):
    kw.pop("frm", None), kw.pop("ffm", None)  # IFRM/IFFM hardwired (ref :315)
    return SegNextEncoder(depths=(3, 3, 9, 3), dims=(32, 64, 160, 256), **kw)


def segnext_small(**kw):
    kw.pop("frm", None), kw.pop("ffm", None)
    return SegNextEncoder(depths=(3, 3, 27, 3), dims=(64, 128, 320, 512), **kw)


def segnext_base(**kw):
    kw.pop("frm", None), kw.pop("ffm", None)
    return SegNextEncoder(depths=(3, 3, 27, 3), dims=(64, 128, 320, 512), **kw)


def segnext_large(**kw):
    kw.pop("frm", None), kw.pop("ffm", None)
    return SegNextEncoder(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768), **kw)


CHANNELS = {
    "segnext_tiny": (32, 64, 160, 256),
    "segnext_small": (64, 128, 320, 512),
    "segnext_base": (64, 128, 320, 512),
    "segnext_large": (96, 192, 384, 768),
}
