"""Dual-branch Swin Transformer encoder.

Parity target: reference `models/encoders/dual_swin.py` — two Swin towers
(windowed attention with relative position bias + shifted windows, PatchMerging
downsampling) with per-stage FRM rectification on the pre-downsample features and
FFM fusion of the per-stage outputs (reference :644-678). Variants swin_s
(96, [2,2,18,2], window 7) / swin_b (128, [2,2,18,2], window 12)
(reference :686-697).

TPU-first notes: NHWC layout; the shifted-window attention masks and relative
position indices are compile-time numpy constants. Window attention runs on the
whole (B, Hp, Wp, C) image through free views (Hp=(i ws), Wp=(j ws)) and
multi-batch-dim einsums — the reference's partition/reverse 6-D transposes are
never materialized (they cost 110 ms/step in XLA `copy` ops when expressed
literally; profiled, see docs/PERF.md "Swin"). `window_partition`/
`window_reverse` remain for the golden tests' legacy (B_, N, C) path.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from rgbx_semantic_segmentation_tpu.models import fusion
from rgbx_semantic_segmentation_tpu.ops import layers as L
from rgbx_semantic_segmentation_tpu.ops import window_attention as WA

Dtype = Any


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C) (reference dual_swin.py:47-58)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(windows: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """(B*nW, ws*ws, C) -> (B, H, W, C) (reference dual_swin.py:61-74)."""
    C = windows.shape[-1]
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def _relative_position_index(ws: int) -> np.ndarray:
    """Static pairwise relative-position lookup (reference dual_swin.py:103-114)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))          # 2, ws, ws
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]               # 2, N, N
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)                                      # N, N


def _shift_attn_mask(Hp: int, Wp: int, ws: int, shift: int) -> np.ndarray:
    """Static SW-MSA mask (nW, N, N) of 0 / -100 (reference dual_swin.py:362-381)."""
    img = np.zeros((1, Hp, Wp, 1), np.float32)
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for h in slices:
        for w in slices:
            img[:, h, w, :] = cnt
            cnt += 1
    win = img.reshape(1, Hp // ws, ws, Wp // ws, ws, 1)
    win = win.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class SwinMlp(nn.Module):
    """fc1 -> GELU -> fc2 (reference dual_swin.py:26-44)."""

    dim: int
    hidden: int
    drop: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from rgbx_semantic_segmentation_tpu.ops.sharding import constrain

        # fc1/fc2 follow the same TP naming contract as the MiT Mix-FFN
        # (parallel/mesh._tp_spec): hidden split on 'model' under a dp x tp
        # mesh; the pins are no-ops on other meshes.
        x = L.dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = constrain(x, "data", None, "model")
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = L.dense(self.dim, dtype=self.dtype, name="fc2")(x)
        x = constrain(x, "data")
        return nn.Dropout(self.drop, deterministic=not train)(x)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference dual_swin.py:77-155)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, mask: Optional[np.ndarray] = None,
                 train: bool = False):
        """Two input forms, same params/math:

        - (B, Hp, Wp, C) whole padded/rolled image — the fused-kernel path
          (caller gates on `use_pallas` + WA.usable): qkv projects on the
          image, ONE channel-intact token-regrouping transpose packs
          (S, B, T, 3C) kernel layout, the qk+bias+softmax+dropout+pv
          middle runs in ops/window_attention.py (heads split in-kernel;
          probs never touch HBM), one transpose restores image layout.
          P windows along the i axis share a slice block-diagonally
          (WA.pack_factor).
        - (B_, N, C) pre-partitioned windows — the reference XLA composition
          (dual_swin.py:117-155), the fallback and golden-test path.

        An 8-D "transpose-free" einsum formulation was tried and rejected:
        XLA pads its (b,i,j,h,7,7,7,7) probs layout 23->128 lanes (95 MB ->
        506 MB per block, compile-time OOM).
        """
        C = x.shape[-1]
        h = self.num_heads
        d = C // h
        scale = d ** -0.5
        ws = self.window_size
        N = ws * ws
        qkv_dense = L.dense(self.dim * 3, use_bias=self.qkv_bias,
                            dtype=self.dtype, name="qkv")
        proj_dense = L.dense(self.dim, dtype=self.dtype, name="proj")
        table = self.param("relative_position_bias_table", L.trunc_normal_init,
                           ((2 * ws - 1) * (2 * ws - 1), h))
        idx = _relative_position_index(ws).reshape(-1)
        bias = table[idx].reshape(N, N, h).transpose(2, 0, 1)   # (h, N, N)

        if x.ndim == 4:
            B, Hp, Wp, C = x.shape
            ni, nj = Hp // ws, Wp // ws
            nW = ni * nj
            P = WA.pack_factor(ni, N)
            nip = ni // P
            S = nip * nj
            # v3 kernel layout (ops/window_attention.py): the channel dim
            # stays INTACT (heads/components split in-kernel), so this
            # transpose is a pure token regrouping with ws*3C-contiguous
            # runs — v2's head-major layout moved d=32 (64-byte) runs and
            # cost ~135 ms/step at swin_s b8 (docs/PERF.md "Swin").
            qkv = qkv_dense(x).reshape(B, nip, P, ws, nj, ws, 3 * C)
            qkv = qkv.transpose(1, 4, 0, 2, 3, 5, 6).reshape(
                S, B, P * N, 3 * C)
            if mask is not None:
                comb = jnp.asarray(mask)[:, None] + bias[None]  # (nW, h, N, N)
            else:
                comb = jnp.broadcast_to(bias[None], (nW, h, N, N))
            comb = (comb.reshape(nip, P, nj, h, N, N)
                    .transpose(0, 2, 3, 1, 4, 5)
                    .reshape(S, h, P, N, N).astype(jnp.float32))
            rate = self.attn_drop if train else 0.0
            if rate > 0.0:
                key = self.make_rng("dropout")
                seed = jax.random.randint(
                    key, (1,), jnp.iinfo(jnp.int32).min,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
            else:
                seed = jnp.zeros((1,), jnp.int32)
            plan = WA.mesh_plan(B)  # non-None: SwinBlock's dispatch gate
            if plan[0] == "direct":
                out = WA.window_attention(qkv, comb, seed, scale, rate,
                                          plan[2])
            else:
                mesh, data_axis = plan[1]
                out = WA.window_attention_sharded(
                    qkv, comb, seed, scale, rate, mesh, data_axis,
                    interpret=plan[2])
            out = (out.reshape(nip, nj, B, P, ws, ws, C)
                   .transpose(2, 0, 3, 4, 1, 5, 6)
                   .reshape(B, Hp, Wp, C))
            out = proj_dense(out)
            return nn.Dropout(self.proj_drop, deterministic=not train)(out)

        B_, N, C = x.shape
        qkv = qkv_dense(x).reshape(B_, N, 3, h, d)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3) * scale
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nW = mask.shape[0]
            m = jnp.asarray(mask)
            attn = attn.reshape(B_ // nW, nW, h, N, N) + m[None, :, None]
            attn = attn.reshape(B_, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.astype(v.dtype).transpose(0, 2, 1, 3).reshape(B_, N, C)
        out = proj_dense(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class SwinBlock(nn.Module):
    """Swin block with optional cyclic shift (reference dual_swin.py:158-255)."""

    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    use_pallas: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, H: int, W: int, train: bool = False):
        B, L_, C = x.shape
        ws = self.window_size
        shortcut = x
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x).reshape(B, H, W, C)
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        if pad_b or pad_r:
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r
        if self.shift_size > 0:
            y = jnp.roll(y, (-self.shift_size, -self.shift_size), axis=(1, 2))
            mask = _shift_attn_mask(Hp, Wp, ws, self.shift_size)
        else:
            mask = None
        attn_mod = WindowAttention(
            self.dim, ws, self.num_heads, self.qkv_bias, self.attn_drop,
            self.drop, use_pallas=self.use_pallas, dtype=self.dtype,
            name="attn")
        if (self.use_pallas and WA.usable(ws * ws, C // self.num_heads)
                and WA.mesh_plan(x.shape[0]) is not None):
            y = attn_mod(y, mask, train)           # whole-image kernel path
        else:
            windows = window_partition(y, ws)
            attn_out = attn_mod(windows, mask, train)
            y = window_reverse(attn_out, ws, Hp, Wp)
        if self.shift_size > 0:
            y = jnp.roll(y, (self.shift_size, self.shift_size), axis=(1, 2))
        if pad_b or pad_r:
            y = y[:, :H, :W]
        y = y.reshape(B, H * W, C)
        dp = L.DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(y, deterministic=not train)
        z = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        z = SwinMlp(self.dim, int(self.dim * self.mlp_ratio), self.drop,
                    dtype=self.dtype, name="mlp")(z, train)
        return x + dp(z, deterministic=not train)


class BasicLayer(nn.Module):
    """One Swin stage (reference dual_swin.py:300-389); blocks alternate
    shift 0 / ws//2."""

    dim: int
    depth: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = (0.0,)
    remat: bool = False
    use_pallas: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, H: int, W: int, train: bool = False):
        # remat maps the reference's use_checkpoint (dual_swin.py:385-386):
        # per-block jax.checkpoint recomputes activations on the backward.
        block_cls = (nn.remat(SwinBlock, static_argnums=(2, 3, 4))
                     if self.remat else SwinBlock)
        for i in range(self.depth):
            blk = block_cls(
                dim=self.dim, num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop=self.drop, attn_drop=self.attn_drop,
                drop_path=self.drop_path[i], use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"blocks_{i}")
            x = blk(x, H, W, train)
        return x


class PatchMerging(nn.Module):
    """2x2 patch concat + LayerNorm + Linear(4C->2C)
    (reference dual_swin.py:258-297)."""

    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, H: int, W: int):
        B, L_, C = x.shape
        y = x.reshape(B, H, W, C)
        if H % 2 or W % 2:
            y = jnp.pad(y, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = y[:, 0::2, 0::2]
        x1 = y[:, 1::2, 0::2]
        x2 = y[:, 0::2, 1::2]
        x3 = y[:, 1::2, 1::2]
        y = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        y = y.reshape(B, -1, 4 * C)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        return L.dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                       name="reduction")(y)


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding (reference dual_swin.py:392-431)."""

    patch_size: int = 4
    embed_dim: int = 96
    patch_norm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        H, W = x.shape[1:3]
        if W % p:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, p - W % p), (0, 0)))
        if H % p:
            x = jnp.pad(x, ((0, 0), (0, p - H % p), (0, 0), (0, 0)))
        x = L.conv(self.embed_dim, p, stride=p, padding="VALID",
                   dtype=self.dtype, name="proj")(x)
        B, Wh, Ww, C = x.shape
        x = x.reshape(B, Wh * Ww, C)
        if self.patch_norm:
            x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x, Wh, Ww


class DualSwinTransformer(nn.Module):
    """Two Swin towers with per-stage FRM + FFM (reference dual_swin.py:434-678).

    FRM is applied to pre-downsample features and its outputs feed both the next
    stage's PatchMerging and (normed) the FFM fusion, exactly as the reference
    wires it (:644-676). `frozen_stages`/APE supported; `remat` enables
    jax.checkpoint on blocks (maps reference use_checkpoint, :385-386).
    """

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    ape: bool = False
    pretrain_img_size: int = 224
    patch_size: int = 4
    patch_norm: bool = True
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    remat: bool = False
    frm: str = "FRM"
    ffm: str = "FFM"
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    use_pallas: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x_rgb, x_e, train: bool = False):
        num_layers = len(self.depths)
        dims = [int(self.embed_dim * 2 ** i) for i in range(num_layers)]
        dpr = [float(v) for v in
               np.linspace(0, self.drop_path_rate, sum(self.depths))]
        frm_cls = fusion.get_frm(self.frm)
        ffm_cls = fusion.get_ffm(self.ffm)

        fs = self.frozen_stages
        x, Wh, Ww = PatchEmbed(self.patch_size, self.embed_dim,
                               self.patch_norm, dtype=self.dtype,
                               name="patch_embed")(x_rgb)
        x_d, _, _ = PatchEmbed(self.patch_size, self.embed_dim,
                               self.patch_norm, dtype=self.dtype,
                               name="patch_embed_d")(x_e)
        if fs >= 0:
            # Freeze semantics (reference _freeze_stages, dual_swin.py:585-600):
            # stop_gradient here zeroes grads for the frozen prefix; the
            # optimizer additionally masks its updates (optim.frozen_mask) so
            # AdamW weight decay cannot move frozen params either. QUIRK FIXED:
            # the reference freezes only the RGB tower (patch_embed / layers —
            # upstream single-tower code applied unchanged to the dual tower);
            # both towers freeze here, documented in PARITY.md.
            x = jax.lax.stop_gradient(x)
            x_d = jax.lax.stop_gradient(x_d)
        if self.ape:
            res = self.pretrain_img_size // self.patch_size
            ape = self.param("absolute_pos_embed", L.trunc_normal_init,
                             (1, res, res, self.embed_dim))
            ape_d = self.param("absolute_pos_embed_d", L.trunc_normal_init,
                               (1, res, res, self.embed_dim))
            if fs >= 1:  # reference dual_swin.py:591-592
                ape = jax.lax.stop_gradient(ape)
                ape_d = jax.lax.stop_gradient(ape_d)
            # torch interpolates the stored (pretrain/patch)^2 grid to the
            # runtime token grid with BICUBIC (reference dual_swin.py:631-635).
            from rgbx_semantic_segmentation_tpu.ops.resize import (
                resize_bicubic_torch)
            x = x + resize_bicubic_torch(ape, (Wh, Ww)).reshape(1, Wh * Ww, -1)
            x_d = x_d + resize_bicubic_torch(ape_d, (Wh, Ww)).reshape(
                1, Wh * Ww, -1)
        # pos_drop runs in eval mode once stages are frozen (reference :594-595).
        pos_drop = nn.Dropout(self.drop_rate,
                              deterministic=not train or fs >= 2)
        x = pos_drop(x)
        x_d = pos_drop(x_d)

        outs = []
        H, W = Wh, Ww
        for i in range(num_layers):
            # Stage i is frozen iff fs >= 2 and i < fs - 1 (reference
            # range(0, frozen_stages - 1), dual_swin.py:594-600): frozen stages
            # run in eval mode (no dropout/droppath) and their outputs are
            # gradient-stopped. FRMs/FFMs/downsamples stay trainable, as in
            # the reference.
            frozen_layer = fs >= 2 and i < fs - 1
            layer_train = train and not frozen_layer
            dp = dpr[sum(self.depths[:i]): sum(self.depths[:i + 1])]
            kw = dict(dim=dims[i], depth=self.depths[i],
                      num_heads=self.num_heads[i],
                      window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                      qkv_bias=self.qkv_bias, drop=self.drop_rate,
                      attn_drop=self.attn_drop_rate, drop_path=tuple(dp),
                      remat=self.remat, use_pallas=self.use_pallas,
                      dtype=self.dtype)
            x = BasicLayer(**kw, name=f"layers_{i}")(x, H, W, layer_train)
            x_d = BasicLayer(**kw, name=f"layers_d_{i}")(x_d, H, W, layer_train)
            if frozen_layer:
                x = jax.lax.stop_gradient(x)
                x_d = jax.lax.stop_gradient(x_d)

            B = x.shape[0]
            m = x.reshape(B, H, W, dims[i])
            m_d = x_d.reshape(B, H, W, dims[i])
            m, m_d = frm_cls(dim=dims[i], reduction=1, dtype=self.dtype,
                             name=f"FRMs_{i}")(m, m_d, train)
            x = m.reshape(B, H * W, dims[i])
            x_d = m_d.reshape(B, H * W, dims[i])
            x_out, x_out_d = x, x_d

            if i < num_layers - 1:
                x = PatchMerging(dims[i], dtype=self.dtype,
                                 name=f"downsamples_{i}")(x, H, W)
                x_d = PatchMerging(dims[i], dtype=self.dtype,
                                   name=f"downsamples_d_{i}")(x_d, H, W)
                next_H, next_W = (H + 1) // 2, (W + 1) // 2
            else:
                next_H, next_W = H, W

            if i in self.out_indices:
                n = nn.LayerNorm(dtype=self.dtype, name=f"norm{i}")(x_out)
                n_d = nn.LayerNorm(dtype=self.dtype, name=f"norm_d{i}")(x_out_d)
                n = n.reshape(B, H, W, dims[i])
                n_d = n_d.reshape(B, H, W, dims[i])
                fused = ffm_cls(dim=dims[i], reduction=1,
                                num_heads=self.num_heads[i],
                                bn_momentum=self.bn_momentum,
                                bn_eps=self.bn_eps, dtype=self.dtype,
                                name=f"FFMs_{i}")(n, n_d, train)
                outs.append(fused)
            H, W = next_H, next_W
        return outs


def swin_s(**kw):
    """reference dual_swin.py:686-690."""
    return DualSwinTransformer(
        embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24),
        window_size=7, attn_drop_rate=0.3, drop_path_rate=0.1, **kw)


def swin_b(**kw):
    """reference dual_swin.py:692-696."""
    return DualSwinTransformer(
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
        window_size=12, attn_drop_rate=0.3, drop_path_rate=0.1,
        pretrain_img_size=384, **kw)


CHANNELS = {
    "swin_s": (96, 192, 384, 768),
    "swin_b": (128, 256, 512, 1024),
}
