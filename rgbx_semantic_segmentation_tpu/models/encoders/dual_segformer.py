"""Dual-branch SegFormer (MiT) encoder — the primary CMX backbone.

Parity target: reference `models/encoders/dual_segformer.py` — two parallel MiT
towers (rgb + extra modality), 4 stages of OverlapPatchEmbed + spatial-reduction
attention Blocks + Mix-FFN, with per-stage FRM rectification and FFM fusion
(reference :366-442). Variants b0..b5 per reference :483-528.

TPU-first design notes:
  - NHWC layout end-to-end; tokens are (B, N, C) with N = H*W.
  - Explicit torch-style symmetric conv padding (k//2 both sides): XLA 'SAME'
    pads asymmetrically under stride > 1, which would break checkpoint parity.
  - Both towers' blocks are independent modules (like the reference) but the
    whole 4-stage pipeline is one jit region; XLA fuses FRM gating and Mix-FFN
    elementwise work into the surrounding matmuls.
  - Stochastic depth follows the true SegFormer decay rule dpr[cur+i] for both
    towers; the reference deviates on stage 2 (passes dpr[cur]/dpr[cur+1] for all
    stage-2 blocks, reference :267-279) — documented deviation, no param impact.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from rgbx_semantic_segmentation_tpu.models import fusion
from rgbx_semantic_segmentation_tpu.ops import layers as L
from rgbx_semantic_segmentation_tpu.ops.attention import multi_head_attention
from rgbx_semantic_segmentation_tpu.ops.sharding import axis_size, constrain

DATA, SPATIAL, MODEL = "data", "spatial", "model"  # mesh axes (parallel/mesh.py)

Dtype = Any

LN_EPS = 1e-6  # reference partial(nn.LayerNorm, eps=1e-6), dual_segformer.py:487


class DWConv(nn.Module):
    """3x3 depthwise conv over tokens (reference dual_segformer.py:19-33)."""

    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, H: int, W: int):
        B, N, C = x.shape
        y = x.reshape(B, H, W, C)
        y = L.conv(self.dim, 3, padding=((1, 1), (1, 1)), groups=self.dim,
                   dtype=self.dtype, name="dwconv")(y)
        return y.reshape(B, N, C)


class Mlp(nn.Module):
    """Mix-FFN: fc1 -> 3x3 DWConv -> GELU -> fc2 (reference :36-74).

    gelu_approximate=False matches torch nn.GELU (erf); the tanh form is 12%
    faster end-to-end on v5e (erf is VPU-expensive) and training-equivalent —
    ModelConfig.gelu_approximate selects it for the flagship config."""

    in_features: int
    hidden_features: int
    drop: float = 0.0
    gelu_approximate: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, H: int, W: int, train: bool = False):
        # Under a (data x model) TP mesh (parallel/mesh.make_mesh_dp_tp) the
        # hidden activation stays split on 'model' from fc1 through the
        # depthwise conv and GELU; fc2 contracts the split dim and GSPMD
        # all-reduces the partial outputs. The pins keep the partitioner from
        # re-gathering the hidden between ops; no-ops on other meshes.
        x = L.dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = constrain(x, DATA, None, MODEL)
        x = DWConv(self.hidden_features, dtype=self.dtype, name="dwconv")(x, H, W)
        x = constrain(x, DATA, None, MODEL)
        x = nn.gelu(x, approximate=self.gelu_approximate)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = L.dense(self.in_features, dtype=self.dtype, name="fc2")(x)
        x = constrain(x, DATA)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        return x


class Attention(nn.Module):
    """Spatial-reduction attention (reference :77-138): kv computed on a
    sr_ratio-strided conv downsample of the token map, giving O(N * N/r^2)
    attention on large grids."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    sr_ratio: int = 1
    use_pallas: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, H: int, W: int, train: bool = False):
        B, N, C = x.shape
        h = self.num_heads
        d = C // h
        scale = d ** -0.5
        # Sharding pins (2-D data x spatial mesh; no-ops otherwise): when the
        # token-grid rows divide the 'spatial' axis, queries/tokens shard along
        # N and the SR-downsampled kv tokens (N/r^2, small) replicate across
        # 'spatial' — without the pins GSPMD falls back to involuntary full
        # rematerialization on the backward reshapes (VERDICT r1 #7). Stages
        # whose H doesn't divide stay unconstrained (replicated rows).
        sp = axis_size(SPATIAL)
        M_est = ((H // self.sr_ratio) * (W // self.sr_ratio)
                 if self.sr_ratio > 1 else N)
        # Shard tokens only when the rows divide AND the kv side is big enough
        # to absorb the backward reduce-scatter (M >= spatial axis); otherwise
        # force replication — degenerate-M stages (tiny dry-run grids) trip the
        # partitioner's reduce-scatter onto size-1 dims.
        rows_ok = sp is not None and H % sp == 0 and M_est >= sp
        n_spec = SPATIAL if rows_ok else None
        q = L.dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="q")(x).reshape(B, N, h, d).transpose(0, 2, 1, 3)
        q = constrain(q, DATA, None, n_spec, None)
        if self.sr_ratio > 1:
            xm = constrain(x.reshape(B, H, W, C), DATA, n_spec)
            xm = L.conv(self.dim, self.sr_ratio, stride=self.sr_ratio,
                        padding="VALID", dtype=self.dtype, name="sr")(xm)
            xk = constrain(xm.reshape(B, -1, C), DATA)
            xk = L.layer_norm(LN_EPS, dtype=self.dtype, name="norm")(xk)
        else:
            xk = x
        M = xk.shape[1]
        kv = L.dense(self.dim * 2, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="kv")(xk).reshape(B, M, 2, h, d)
        kv = constrain(kv, DATA)
        k = kv[:, :, 0].transpose(0, 2, 1, 3)
        v = kv[:, :, 1].transpose(0, 2, 1, 3)
        # attn_drop sits between softmax and the v-matmul in the reference
        # (:131-133); the default rate is 0 everywhere (mit factories). The
        # fused kernels never materialise probs in HBM, so a non-zero training
        # rate composes attention in XLA with Dropout on the fp32 probs;
        # eval mode (dropout = identity) stays on the fused dispatch.
        # Under an active device mesh, pallas_call has no GSPMD partitioning
        # rule, so the kernel is explicitly shard_mapped instead
        # (sr_attention_sharded): batch on 'data', q tokens on 'spatial' when
        # rows divide (same layout the constrain() pins establish), kv
        # replicated over 'spatial' with a psum'd dk/dv backward.
        if self.attn_drop > 0.0 and train:
            logits = jnp.einsum(
                "bhnd,bhmd->bhnm", q, k,
                preferred_element_type=jnp.float32) * scale
            # Pin the materialised fp32 probs to q's layout so the backward
            # reshape stays sharded under a mesh (the unpinned-backward-
            # reshape hazard the fused path avoids by construction).
            logits = constrain(logits, DATA, None, n_spec, None)
            probs = jax.nn.softmax(logits, axis=-1)
            probs = nn.Dropout(self.attn_drop, deterministic=False)(probs)
            probs = constrain(probs, DATA, None, n_spec, None)
            out = jnp.einsum("bhnm,bhmd->bhnd", probs.astype(v.dtype), v)
            out = constrain(out, DATA, None, n_spec, None)
            out = out.transpose(0, 2, 1, 3).reshape(B, N, h * d)
        else:
            out = self._attend(q, k, v, scale, n_spec)
        out = constrain(out, DATA, n_spec, None)
        out = L.dense(self.dim, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=not train)(out)
        return out

    def _attend(self, q, k, v, scale, n_spec):
        """Dispatch the attention middle: fused Pallas kernel (direct or
        shard_mapped under a mesh) when profitable/possible, else XLA."""
        from rgbx_semantic_segmentation_tpu.ops import sr_attention as SR
        from rgbx_semantic_segmentation_tpu.ops.attention import _on_tpu
        from rgbx_semantic_segmentation_tpu.ops.sharding import _active_mesh

        B, h, N, d = q.shape
        mesh = _active_mesh()
        if self.use_pallas and mesh is not None and SR.supported(
                q.shape, k.shape):
            # Interpret mode lets the CPU-mesh dry run / tests execute the
            # real multi-chip kernel path (opt-in: it is slow).
            import os
            interpret = (not _on_tpu()) and bool(
                os.environ.get("RGBX_PALLAS_INTERPRET"))
            if _on_tpu() or interpret:
                da = axis_size(DATA)
                sp_sz = axis_size(SPATIAL)
                data_ax = DATA if da is not None and (B * h) % da == 0 \
                    else None
                n_ax = n_spec if sp_sz is not None and n_spec is not None \
                    and N % sp_sz == 0 else None
                if (da or 1) == 1 or data_ax is not None:
                    out = SR.sr_attention_sharded(
                        q, k, v, scale, mesh, data_ax, n_ax,
                        interpret=interpret)
                    return out.transpose(0, 2, 1, 3).reshape(B, N, h * d)
        fused = (self.use_pallas and mesh is None)
        return multi_head_attention(q, k, v, scale, use_pallas=fused)


class Block(nn.Module):
    """Transformer block: x += DropPath(Attn(LN(x))); x += DropPath(MixFFN(LN(x)))
    (reference :141-180)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    sr_ratio: int = 1
    use_pallas: bool = False
    gelu_approximate: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, H: int, W: int, train: bool = False):
        dp = L.DropPath(self.drop_path, name="drop_path")
        y = L.layer_norm(LN_EPS, dtype=self.dtype, name="norm1")(x)
        y = Attention(self.dim, self.num_heads, self.qkv_bias, self.attn_drop,
                      self.drop, self.sr_ratio, self.use_pallas,
                      dtype=self.dtype, name="attn")(y, H, W, train)
        x = x + dp(y, deterministic=not train)
        y = L.layer_norm(LN_EPS, dtype=self.dtype, name="norm2")(x)
        y = Mlp(self.dim, int(self.dim * self.mlp_ratio), self.drop,
                gelu_approximate=self.gelu_approximate,
                dtype=self.dtype, name="mlp")(y, H, W, train)
        x = x + dp(y, deterministic=not train)
        return x


class OverlapPatchEmbed(nn.Module):
    """Strided-conv patch embedding with overlap (reference :183-225)."""

    patch_size: int
    stride: int
    embed_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        p = self.patch_size // 2
        x = L.conv(self.embed_dim, self.patch_size, stride=self.stride,
                   padding=((p, p), (p, p)), dtype=self.dtype,
                   name="proj")(x)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = L.layer_norm(LN_EPS, dtype=self.dtype, name="norm")(x)
        return x, H, W


class RGBXTransformer(nn.Module):
    """Dual-tower MiT with per-stage FRM/FFM (reference :228-446).

    Returns the 4 fused feature maps [1/4, 1/8, 1/16, 1/32] in NHWC.
    """

    embed_dims: Sequence[int] = (64, 128, 256, 512)
    num_heads: Sequence[int] = (1, 2, 4, 8)
    mlp_ratios: Sequence[float] = (4, 4, 4, 4)
    depths: Sequence[int] = (3, 4, 6, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    qkv_bias: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    frm: str = "FRM"     # FRM | IFRM (reference config.feature_rectify_module)
    ffm: str = "FFM"     # FFM | IFFM
    # None | "aspp" (per-stage ASPP on the fused maps, reference
    # dual_segformer_w_aspp.py:398-402) | "easpp" (single eASPP after stage 4,
    # reference dual_segformer_w_ef_aspp.py:476-477).
    aspp: Optional[str] = None
    use_pallas: bool = False
    gelu_approximate: bool = False
    # Rematerialise transformer blocks in backward (activation checkpointing):
    # trades FLOPs for HBM, enabling mit_b4/b5 at larger batch (maps the
    # reference Swin use_checkpoint flag, dual_swin.py:385-386, to the MiT
    # family as well).
    remat: bool = False
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x_rgb, x_e, train: bool = False):
        import numpy as np
        total_depth = sum(self.depths)
        # Static python floats: the stochastic-depth schedule is a compile-time
        # constant (reference torch.linspace, dual_segformer.py:249).
        dpr = [float(x) for x in np.linspace(0, self.drop_path_rate, total_depth)]
        frm_cls = fusion.get_frm(self.frm)
        ffm_cls = fusion.get_ffm(self.ffm)
        block_cls = (nn.remat(Block, static_argnums=(2, 3, 4))
                     if self.remat else Block)
        patch_cfg = [(7, 4), (3, 2), (3, 2), (3, 2)]  # (kernel, stride) per stage

        outs = []
        cur = 0
        for s in range(4):
            k, st = patch_cfg[s]
            dim = self.embed_dims[s]
            x_rgb, H, W = OverlapPatchEmbed(
                k, st, dim, dtype=self.dtype, name=f"patch_embed{s + 1}")(x_rgb)
            x_e, _, _ = OverlapPatchEmbed(
                k, st, dim, dtype=self.dtype,
                name=f"extra_patch_embed{s + 1}")(x_e)
            for i in range(self.depths[s]):
                blk_kw = dict(
                    dim=dim, num_heads=self.num_heads[s],
                    mlp_ratio=self.mlp_ratios[s], qkv_bias=self.qkv_bias,
                    drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                    drop_path=dpr[cur + i], sr_ratio=self.sr_ratios[s],
                    use_pallas=self.use_pallas,
                    gelu_approximate=self.gelu_approximate, dtype=self.dtype)
                x_rgb = block_cls(**blk_kw, name=f"block{s + 1}_{i}")(
                    x_rgb, H, W, train)
                x_e = block_cls(**blk_kw, name=f"extra_block{s + 1}_{i}")(
                    x_e, H, W, train)
            x_rgb = L.layer_norm(LN_EPS, dtype=self.dtype,
                                 name=f"norm{s + 1}")(x_rgb)
            x_e = L.layer_norm(LN_EPS, dtype=self.dtype,
                               name=f"extra_norm{s + 1}")(x_e)
            B = x_rgb.shape[0]
            m_rgb = x_rgb.reshape(B, H, W, dim)
            m_e = x_e.reshape(B, H, W, dim)
            m_rgb, m_e = frm_cls(dim=dim, reduction=1, dtype=self.dtype,
                                 name=f"FRMs_{s}")(m_rgb, m_e, train)
            ffm_kw = dict(dim=dim, reduction=1, num_heads=self.num_heads[s],
                          bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                          dtype=self.dtype)
            if self.ffm == "IFFM":
                # IFFM's quadratic cross-attention needs the fused kernels to
                # fit at production resolution (fusion.py ImprovedCrossAttention
                # docstring); plain FFM has no such knob.
                ffm_kw["use_pallas"] = self.use_pallas
            fused = ffm_cls(**ffm_kw, name=f"FFMs_{s}")(m_rgb, m_e, train)
            if self.aspp == "aspp":
                from rgbx_semantic_segmentation_tpu.models.encoders.aspp import (
                    STAGE_ASPP_RATES, StageASPP)
                fused = StageASPP(dim, STAGE_ASPP_RATES[s],
                                  bn_momentum=self.bn_momentum,
                                  dtype=self.dtype,
                                  name=f"aspp_modules_{s}")(fused, train)
            elif self.aspp == "easpp" and s == 3:
                from rgbx_semantic_segmentation_tpu.models.encoders.aspp import (
                    EASPP)
                fused = EASPP(dim, (12, 24, 36), bn_momentum=self.bn_momentum,
                              dtype=self.dtype, name="single_aspp")(fused, train)
            outs.append(fused)
            x_rgb, x_e = m_rgb, m_e  # next stage embeds the rectified maps
            cur += self.depths[s]
        return outs


def _mit(embed_dims, depths, **overrides):
    kw = dict(
        embed_dims=embed_dims, num_heads=(1, 2, 5, 8), mlp_ratios=(4, 4, 4, 4),
        qkv_bias=True, depths=depths, sr_ratios=(8, 4, 2, 1),
        drop_rate=0.0, drop_path_rate=0.1)
    kw.update(overrides)
    return functools.partial(RGBXTransformer, **kw)


# Factories mirroring reference dual_segformer.py:483-528.
def mit_b0(**kw):
    return _mit((32, 64, 160, 256), (2, 2, 2, 2), **kw)()


def mit_tiny(**kw):
    """Test-scale variant (no reference counterpart): one block per stage.
    Exercises every architectural path of the MiT family (patch embeds,
    SR-attention at all 4 sr_ratios, Mix-FFN, FRM/FFM) at half mit_b0's
    graph size — used by the multichip dry run and mesh tests to keep
    XLA:CPU GSPMD compile time inside CI budgets."""
    return _mit((32, 64, 160, 256), (1, 1, 1, 1), **kw)()


def mit_b1(**kw):
    return _mit((64, 128, 320, 512), (2, 2, 2, 2), **kw)()


def mit_b2(**kw):
    return _mit((64, 128, 320, 512), (3, 4, 6, 3), **kw)()


def mit_b3(**kw):
    return _mit((64, 128, 320, 512), (3, 4, 18, 3), **kw)()


def mit_b4(**kw):
    return _mit((64, 128, 320, 512), (3, 8, 27, 3), **kw)()


def mit_b5(**kw):
    return _mit((64, 128, 320, 512), (3, 6, 40, 3), **kw)()


# Output channel lists per variant (what decoders consume).
CHANNELS = {
    "mit_tiny": (32, 64, 160, 256),
    "mit_b0": (32, 64, 160, 256),
    "mit_b1": (64, 128, 320, 512),
    "mit_b2": (64, 128, 320, 512),
    "mit_b3": (64, 128, 320, 512),
    "mit_b4": (64, 128, 320, 512),
    "mit_b5": (64, 128, 320, 512),
}
