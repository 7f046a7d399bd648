"""Cross-modal fusion primitives: FRM / FFM and their Improved variants.

Parity targets: reference `models/net_utils.py` (the heart of CMX):
  - ChannelWeights / SpatialWeights / FeatureRectifyModule   (net_utils.py:10-152)
  - Improved*Weights / ImprovedFeatureRectifyModule          (net_utils.py:33-180)
  - CrossAttention (linear O(N*C^2) exchange) / CrossPath    (net_utils.py:187-305)
  - ChannelEmbed / FeatureFusionModule                       (net_utils.py:309-416)

All modules operate on NHWC maps / (B, N, C) token tensors (TPU-native layout; the
reference uses NCHW). Submodule names mirror the reference's torch attribute paths
(sequential indices fused, e.g. `mlp.0` -> `mlp_0`) so one generic state-dict
converter covers pretrained loading and golden tests (see convert.py).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rgbx_semantic_segmentation_tpu.ops import layers as L

Dtype = Any


class ChannelWeights(nn.Module):
    """Global avg+max pooled MLP channel gates (net_utils.py:10-30).

    Returns (w0, w1), each (B, 1, 1, C); w0 comes from the first half of the MLP
    output exactly like the reference's channel_weights[0].
    """

    dim: int
    reduction: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2):
        B = x1.shape[0]
        x = jnp.concatenate([x1, x2], axis=-1)          # (B, H, W, 2C)
        avg = jnp.mean(x, axis=(1, 2))                  # (B, 2C)
        mx = jnp.max(x, axis=(1, 2))                    # (B, 2C)
        y = jnp.concatenate([avg, mx], axis=-1)         # (B, 4C)
        y = L.dense(self.dim * 4 // self.reduction, dtype=self.dtype,
                    name="mlp_0")(y)
        y = nn.relu(y)
        y = L.dense(self.dim * 2, dtype=self.dtype, name="mlp_2")(y)
        y = nn.sigmoid(y)
        w0 = y[:, : self.dim].reshape(B, 1, 1, self.dim)
        w1 = y[:, self.dim:].reshape(B, 1, 1, self.dim)
        return w0, w1


class SpatialWeights(nn.Module):
    """1x1-conv MLP spatial gates (net_utils.py:69-83). Returns (w0, w1), each
    (B, H, W, 1)."""

    dim: int
    reduction: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2):
        x = jnp.concatenate([x1, x2], axis=-1)
        y = L.conv(self.dim // self.reduction, 1, dtype=self.dtype,
                   name="mlp_0")(x)
        y = nn.relu(y)
        y = L.conv(2, 1, dtype=self.dtype, name="mlp_2")(y)
        y = nn.sigmoid(y)
        return y[..., 0:1], y[..., 1:2]


class FeatureRectifyModule(nn.Module):
    """FRM: cross-modal rectification with fixed lambdas = 0.5
    (net_utils.py:124-152)."""

    dim: int
    reduction: int = 1
    lambda_c: float = 0.5
    lambda_s: float = 0.5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        cw0, cw1 = ChannelWeights(self.dim, self.reduction, self.dtype,
                                  name="channel_weights")(x1, x2)
        sw0, sw1 = SpatialWeights(self.dim, self.reduction, self.dtype,
                                  name="spatial_weights")(x1, x2)
        out_x1 = x1 + self.lambda_c * cw1 * x2 + self.lambda_s * sw1 * x2
        out_x2 = x2 + self.lambda_c * cw0 * x1 + self.lambda_s * sw0 * x1
        return out_x1, out_x2


class ImprovedChannelWeights(nn.Module):
    """LayerNorm+GELU MLP with a learned sigmoid gate (net_utils.py:33-66)."""

    dim: int
    reduction: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2):
        B = x1.shape[0]
        x = jnp.concatenate([x1, x2], axis=-1)
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        y = jnp.concatenate([avg, mx], axis=-1)
        y = L.dense(self.dim * 4 // self.reduction, dtype=self.dtype,
                    name="mlp_0")(y)
        y = L.layer_norm(dtype=self.dtype, name="mlp_1")(y)
        y = nn.gelu(y, approximate=False)
        y = L.dense(self.dim * 2, dtype=self.dtype, name="mlp_3")(y)
        y = L.layer_norm(dtype=self.dtype, name="mlp_4")(y)
        g = L.dense(self.dim * 2, dtype=self.dtype, name="gate_0")(y)
        g = nn.sigmoid(g)
        y = y * g
        w0 = y[:, : self.dim].reshape(B, 1, 1, self.dim)
        w1 = y[:, self.dim:].reshape(B, 1, 1, self.dim)
        return w0, w1


class ImprovedSpatialWeights(nn.Module):
    """3-conv BN/GELU residual block, no final sigmoid (net_utils.py:86-121)."""

    dim: int
    reduction: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x = jnp.concatenate([x1, x2], axis=-1)
        y = L.conv(self.dim // self.reduction, 1, dtype=self.dtype,
                   name="conv1")(x)
        y = L.batch_norm(dtype=self.dtype, name="norm1")(
            y, use_running_average=not train)
        y = nn.gelu(y, approximate=False)
        residual = y
        y = L.conv(self.dim // self.reduction, 1, dtype=self.dtype,
                   name="conv2")(y)
        y = L.batch_norm(dtype=self.dtype, name="norm2")(
            y, use_running_average=not train)
        y = nn.gelu(y, approximate=False)
        y = y + residual
        y = L.conv(2, 1, dtype=self.dtype, name="conv3")(y)
        return y[..., 0:1], y[..., 1:2]


class ImprovedFeatureRectifyModule(nn.Module):
    """IFRM: learnable lambdas + LayerNorm on outputs (net_utils.py:155-180)."""

    dim: int
    reduction: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        cw0, cw1 = ImprovedChannelWeights(self.dim, self.reduction, self.dtype,
                                          name="channel_weights")(x1, x2)
        sw0, sw1 = ImprovedSpatialWeights(self.dim, self.reduction, self.dtype,
                                          name="spatial_weights")(x1, x2, train)
        lam_c = self.param("lambda_channel", nn.initializers.constant(0.5), ())
        lam_s = self.param("lambda_spatial", nn.initializers.constant(0.5), ())
        out_x1 = x1 + lam_c * cw1 * x2 + lam_s * sw1 * x2
        out_x2 = x2 + lam_c * cw0 * x1 + lam_s * sw0 * x1
        # Shared LayerNorm over channels (reference permutes to channels-last;
        # NHWC is already channels-last).
        norm = L.layer_norm(dtype=self.dtype, name="norm")
        return norm(out_x1), norm(out_x2)


class CrossAttention(nn.Module):
    """Linear-attention-style cross-modal exchange (net_utils.py:187-214).

    Per modality i: ctx_i = softmax_{dim=-2}((k_i^T v_i) * scale) — an O(N*C^2)
    context matrix — then x1 = q1 @ ctx2 and x2 = q2 @ ctx1. There are no q/out
    projections; q is just the head-reshaped input. This contracts over the long
    token axis first, which maps straight onto the MXU as two (d x N)(N x d)
    matmuls per head instead of an (N x N) attention matrix.
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2):
        B, N, C = x1.shape
        h = self.num_heads
        d = C // h
        scale = d ** -0.5

        def heads(t):
            return t.reshape(B, N, h, d).transpose(0, 2, 1, 3)  # (B, h, N, d)

        q1, q2 = heads(x1), heads(x2)
        kv1 = L.dense(self.dim * 2, use_bias=self.qkv_bias, dtype=self.dtype,
                      name="kv1")(x1).reshape(B, N, 2, h, d)
        kv2 = L.dense(self.dim * 2, use_bias=self.qkv_bias, dtype=self.dtype,
                      name="kv2")(x2).reshape(B, N, 2, h, d)
        k1, v1 = kv1[:, :, 0].transpose(0, 2, 1, 3), kv1[:, :, 1].transpose(0, 2, 1, 3)
        k2, v2 = kv2[:, :, 0].transpose(0, 2, 1, 3), kv2[:, :, 1].transpose(0, 2, 1, 3)

        def ctx(k, v):
            c = jnp.einsum("bhnd,bhne->bhde", k, v,
                           preferred_element_type=jnp.float32) * scale
            return jax.nn.softmax(c, axis=-2).astype(v.dtype)

        ctx1, ctx2 = ctx(k1, v1), ctx(k2, v2)
        y1 = jnp.einsum("bhnd,bhde->bhne", q1, ctx2,
                        preferred_element_type=jnp.float32)
        y2 = jnp.einsum("bhnd,bhde->bhne", q2, ctx1,
                        preferred_element_type=jnp.float32)
        y1 = y1.astype(x1.dtype).transpose(0, 2, 1, 3).reshape(B, N, C)
        y2 = y2.astype(x2.dtype).transpose(0, 2, 1, 3).reshape(B, N, C)
        return y1, y2


class ImprovedCrossAttention(nn.Module):
    """Standard softmax cross-attention q1*k2^T -> v2 / q2*k1^T -> v1 with q/kv/out
    projections + dropout (net_utils.py:216-257).

    Unlike the linear CrossAttention, this is QUADRATIC in tokens: at stage-1
    480x640 geometry (N = M = 19200) the naive probs tensor is f32[8,1,19200,
    19200] = 11 GB — the reference (and a naive einsum here) cannot even
    compile the 'pp' variants at the published training resolution. With
    use_pallas the attention middle dispatches through the fused kernels
    (flash for long kv, the short-kv SR kernel for small stages) and HBM never
    sees an (N, M) tensor; the XLA fallback keeps the bf16-residual custom
    VJP. Dropout between softmax and the v-matmul (attn_drop > 0 in train
    mode) forces the materialising path — every reference config leaves it 0."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        B, N, C = x1.shape
        h = self.num_heads
        d = C // h
        scale = d ** -0.5

        def proj_qkv(x, qname, kvname):
            q = L.dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                        name=qname)(x).reshape(B, N, h, d).transpose(0, 2, 1, 3)
            kv = L.dense(self.dim * 2, use_bias=self.qkv_bias, dtype=self.dtype,
                         name=kvname)(x).reshape(B, N, 2, h, d)
            k = kv[:, :, 0].transpose(0, 2, 1, 3)
            v = kv[:, :, 1].transpose(0, 2, 1, 3)
            return q, k, v

        q1, k1, v1 = proj_qkv(x1, "q1", "kv1")
        q2, k2, v2 = proj_qkv(x2, "q2", "kv2")
        attn_dropout = nn.Dropout(self.attn_drop, deterministic=not train)
        proj_dropout = nn.Dropout(self.proj_drop, deterministic=not train)

        def attend(q, k, v):
            if self.attn_drop == 0.0 or not train:
                from rgbx_semantic_segmentation_tpu.ops.attention import (
                    multi_head_attention)
                from rgbx_semantic_segmentation_tpu.ops.sharding import (
                    _active_mesh)
                # Kernels only outside a mesh (pallas_call has no GSPMD rule);
                # under a mesh XLA's partitioned _sdpa runs on per-shard rows.
                fused = self.use_pallas and _active_mesh() is None
                return multi_head_attention(q, k, v, scale, use_pallas=fused)
            a = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                           preferred_element_type=jnp.float32) * scale
            a = jax.nn.softmax(a, axis=-1).astype(v.dtype)
            a = attn_dropout(a)
            o = jnp.einsum("bhnm,bhmd->bhnd", a, v,
                           preferred_element_type=jnp.float32)
            return o.astype(v.dtype).transpose(0, 2, 1, 3).reshape(B, N, C)

        y1 = attend(q1, k2, v2)
        y1 = L.dense(self.dim, dtype=self.dtype, name="proj1")(y1)
        y1 = proj_dropout(y1)
        y2 = attend(q2, k1, v1)
        y2 = L.dense(self.dim, dtype=self.dtype, name="proj2")(y2)
        y2 = proj_dropout(y2)
        return y1, y2


class CrossPath(nn.Module):
    """Per-branch expand + cross-attend + merge, residual + LayerNorm
    (net_utils.py:260-281)."""

    dim: int
    reduction: int = 1
    num_heads: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        inner = self.dim // self.reduction
        p1 = nn.relu(L.dense(inner * 2, dtype=self.dtype, name="channel_proj1")(x1))
        p2 = nn.relu(L.dense(inner * 2, dtype=self.dtype, name="channel_proj2")(x2))
        y1, u1 = jnp.split(p1, 2, axis=-1)
        y2, u2 = jnp.split(p2, 2, axis=-1)
        v1, v2 = CrossAttention(inner, self.num_heads, dtype=self.dtype,
                                name="cross_attn")(u1, u2)
        y1 = jnp.concatenate([y1, v1], axis=-1)
        y2 = jnp.concatenate([y2, v2], axis=-1)
        out1 = L.layer_norm(dtype=self.dtype, name="norm1")(
            x1 + L.dense(self.dim, dtype=self.dtype, name="end_proj1")(y1))
        out2 = L.layer_norm(dtype=self.dtype, name="norm2")(
            x2 + L.dense(self.dim, dtype=self.dtype, name="end_proj2")(y2))
        return out1, out2


class ImprovedCrossPath(nn.Module):
    """GELU variant with ImprovedCrossAttention (net_utils.py:283-305)."""

    dim: int
    reduction: int = 1
    num_heads: int = 8
    use_pallas: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        inner = self.dim // self.reduction
        p1 = nn.gelu(L.dense(inner * 2, dtype=self.dtype, name="channel_proj1")(x1),
                     approximate=False)
        p2 = nn.gelu(L.dense(inner * 2, dtype=self.dtype, name="channel_proj2")(x2),
                     approximate=False)
        y1, u1 = jnp.split(p1, 2, axis=-1)
        y2, u2 = jnp.split(p2, 2, axis=-1)
        v1, v2 = ImprovedCrossAttention(inner, self.num_heads,
                                        use_pallas=self.use_pallas,
                                        dtype=self.dtype,
                                        name="cross_attn")(u1, u2, train)
        y1 = jnp.concatenate([y1, v1], axis=-1)
        y2 = jnp.concatenate([y2, v2], axis=-1)
        out1 = L.layer_norm(dtype=self.dtype, name="norm1")(
            x1 + L.dense(self.dim, dtype=self.dtype, name="end_proj1")(y1))
        out2 = L.layer_norm(dtype=self.dtype, name="norm2")(
            x2 + L.dense(self.dim, dtype=self.dtype, name="end_proj2")(y2))
        return out1, out2


class ChannelEmbed(nn.Module):
    """Token -> map projection: 1x1 residual + [1x1 -> 3x3 DW -> ReLU -> 1x1 -> BN]
    bottleneck, summed then BN (net_utils.py:309-329). This holds the only
    BatchNorms in the SegFormer path; their batch stats are globally reduced
    under the data-sharded jit (SyncBN parity)."""

    in_channels: int
    out_channels: int
    reduction: int = 1
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    act: str = "relu"  # "gelu" for the Improved variant (net_utils.py:331-351)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, H: int, W: int, train: bool = False):
        B, N, C = x.shape
        x = x.reshape(B, H, W, C)
        mid = self.out_channels // self.reduction
        residual = L.conv(self.out_channels, 1, use_bias=False, dtype=self.dtype,
                          name="residual")(x)
        y = L.conv(mid, 1, dtype=self.dtype, name="channel_embed_0")(x)
        y = L.conv(mid, 3, groups=mid, dtype=self.dtype,
                   name="channel_embed_1")(y)
        y = nn.relu(y) if self.act == "relu" else nn.gelu(y, approximate=False)
        y = L.conv(self.out_channels, 1, dtype=self.dtype,
                   name="channel_embed_3")(y)
        y = L.batch_norm(self.bn_momentum, self.bn_eps, dtype=self.dtype,
                         name="channel_embed_4")(y, use_running_average=not train)
        out = L.batch_norm(self.bn_momentum, self.bn_eps, dtype=self.dtype,
                           name="norm")(residual + y, use_running_average=not train)
        return out


class FeatureFusionModule(nn.Module):
    """FFM: CrossPath token exchange + ChannelEmbed merge into one fused map
    (net_utils.py:354-384). Input/output NHWC."""

    dim: int
    reduction: int = 1
    num_heads: int = 8
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        B, H, W, C = x1.shape
        t1 = x1.reshape(B, H * W, C)
        t2 = x2.reshape(B, H * W, C)
        t1, t2 = CrossPath(self.dim, self.reduction, self.num_heads,
                           dtype=self.dtype, name="cross")(t1, t2, train)
        merge = jnp.concatenate([t1, t2], axis=-1)
        return ChannelEmbed(self.dim * 2, self.dim, self.reduction,
                            self.bn_momentum, self.bn_eps, "relu",
                            dtype=self.dtype, name="channel_emb")(
            merge, H, W, train)


class ImprovedFeatureFusionModule(nn.Module):
    """IFFM: ImprovedCrossPath + GELU ChannelEmbed (net_utils.py:387-416)."""

    dim: int
    reduction: int = 1
    num_heads: int = 8
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    use_pallas: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        B, H, W, C = x1.shape
        t1 = x1.reshape(B, H * W, C)
        t2 = x2.reshape(B, H * W, C)
        t1, t2 = ImprovedCrossPath(self.dim, self.reduction, self.num_heads,
                                   use_pallas=self.use_pallas,
                                   dtype=self.dtype, name="cross")(t1, t2, train)
        merge = jnp.concatenate([t1, t2], axis=-1)
        return ChannelEmbed(self.dim * 2, self.dim, self.reduction,
                            self.bn_momentum, self.bn_eps, "gelu",
                            dtype=self.dtype, name="channel_emb")(
            merge, H, W, train)


FUSION_REGISTRY = {
    ("FRM",): FeatureRectifyModule,
    ("IFRM",): ImprovedFeatureRectifyModule,
}


def get_frm(name: str):
    return {"FRM": FeatureRectifyModule,
            "IFRM": ImprovedFeatureRectifyModule}[name]


def get_ffm(name: str):
    return {"FFM": FeatureFusionModule,
            "IFFM": ImprovedFeatureFusionModule}[name]
