"""Attention compute paths.

The MiT encoder's spatial-reduction attention (reference dual_segformer.py:77-138)
is the hot op: q has N tokens, k/v are sr-conv downsampled to M = N/r^2, so the
XLA path materialises a (B, h, N, M) fp32 probs buffer in HBM between the two
matmuls (stage 1 at b8 480x640: 184 MB per block per tower, fwd and bwd).

The fused path (use_pallas, default on via ModelConfig.use_pallas_kernels)
dispatches short-kv shapes to the first-party ops/sr_attention.py kernel
(whole kv in VMEM, no online softmax, probs recomputed in the backward —
measured 103.5 -> 95.4 ms on the b8 mit_b2 train step) and long-kv shapes to
the upstream Pallas flash-attention kernel
(jax.experimental.pallas.ops.tpu.flash_attention). The r1 first-party kernel
lost to XLA (16.5 ms vs 7.3 ms at stage-1 shapes — it padded the (N, M) dim)
and was deleted; the kernel history and measurements live in PARITY.md §2.10
and docs/PERF.md.

For the flash path, kv is padded to a 128 multiple with segment-id masking
(exact: padded columns get zero probability); q is padded to a 128 multiple
and the pad rows sliced off the output (exact for real rows).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


from rgbx_semantic_segmentation_tpu.ops.sr_attention import _round_up  # noqa: E402


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def flash_supported(q_shape, k_shape) -> bool:
    """Upstream flash kernel constraints + profitability gate: the fused path
    wins where the (N x M) probs buffer is large (big N); tiny grids keep XLA
    (measured: stage-4 shapes N=M=300 lose with flash bwd)."""
    B, h, N, d = q_shape
    M = k_shape[2]
    return _on_tpu() and N >= 1024 and d >= 32 and d % 8 == 0


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash_attention(q, k, v, scale: float):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    B, h, N, d = q.shape
    M = k.shape[2]
    Np = _round_up(N, 128)
    Mp = _round_up(max(M, 128), 128)
    segment_ids = None
    if Mp != M:
        pad = [(0, 0), (0, 0), (0, Mp - M), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        # Mask the padded kv columns via segment ids (tiny int32 vectors) —
        # NOT an additive-bias tensor: a (B, h, Np, Mp) fp32 ab costs 236 MB
        # at stage-1 shapes and erases the kernel's advantage (measured).
        kv_seg = jnp.zeros((B, Mp), jnp.int32).at[:, M:].set(1)
        segment_ids = SegmentIds(q=jnp.zeros((B, Np), jnp.int32), kv=kv_seg)
    if Np != N:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, Np - N), (0, 0)])

    def _block(n, cands=(768, 512, 384, 256, 128)):
        for c in cands:
            if n % c == 0:
                return c
        return n

    bq = _block(Np)
    # kv tiling: whole kv in one major block only while it fits scoped VMEM
    # (the SR encoder shapes, M <= ~1k). Long kv (the IFFM cross-attention,
    # M = N = 19200 at stage 1) must stream k in tiles — one 19200-token major
    # block is a 20.6 MB scoped allocation and fails compile (> 16 MB VMEM).
    bk = Mp if Mp <= 1024 else _block(Mp)
    bs = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)
    out = flash_attention(q, k, v, segment_ids=segment_ids, sm_scale=scale,
                          block_sizes=bs)
    return out[:, :, :N, :]


import functools as _ft


@_ft.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _sdpa(q, k, v, scale):
    out, _ = _sdpa_fwd(q, k, v, scale)
    return out


def _sdpa_fwd(q, k, v, scale):
    """Forward identical to the naive composition (fp32 logits/softmax on the
    MXU/VPU, bf16 probs into the pv matmul). The custom VJP exists to control
    the RESIDUAL: plain autodiff saves the fp32 probs (for softmax-bwd) AND
    the bf16 cast (for the pv matmul) — 276 MB per stage-1 block at b8; here
    only the bf16 probs are saved and softmax-bwd runs from them."""
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", probs, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out, (q, k, v, probs)


def _sdpa_bwd(scale, res, g):
    q, k, v, probs = res
    g = g.astype(v.dtype)
    dv = jnp.einsum("bhnm,bhnd->bhmd", probs, g,
                    preferred_element_type=jnp.float32).astype(v.dtype)
    dp = jnp.einsum("bhnd,bhmd->bhnm", g, v,
                    preferred_element_type=jnp.float32)
    pf = probs.astype(jnp.float32)
    dl = ((dp - jnp.sum(dp * pf, axis=-1, keepdims=True)) * pf
          * scale).astype(q.dtype)
    dq = jnp.einsum("bhnm,bhmd->bhnd", dl, k,
                    preferred_element_type=jnp.float32).astype(q.dtype)
    dk = jnp.einsum("bhnm,bhnd->bhmd", dl, q,
                    preferred_element_type=jnp.float32).astype(k.dtype)
    return dq, dk, dv


_sdpa.defvjp(_sdpa_fwd, _sdpa_bwd)


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         scale: float,
                         use_pallas: bool = False) -> jnp.ndarray:
    """Softmax attention. q: (B, h, N, d); k, v: (B, h, M, d) -> (B, N, h*d).

    Logits and softmax accumulate in fp32 (bf16 inputs stay bf16 on the MXU);
    the backward keeps only a bf16 probs residual (see _sdpa_fwd). With
    use_pallas (on TPU), short-kv shapes dispatch to the first-party fused
    kernel (ops/sr_attention.py) and long-kv shapes to the upstream flash
    kernel; neither materialises probs in HBM. Callers under an active device
    mesh must pass use_pallas=False and use sr_attention.sr_attention_sharded
    instead (pallas_call has no GSPMD rule; the Attention module's _attend
    dispatches this automatically).
    """
    B, h, N, d = q.shape
    if use_pallas and _on_tpu():
        from rgbx_semantic_segmentation_tpu.ops import sr_attention
        if sr_attention.supported(q.shape, k.shape):
            out = sr_attention.sr_attention(q, k, v, scale)
            return out.transpose(0, 2, 1, 3).reshape(B, N, h * d)
        if flash_supported(q.shape, k.shape):
            out = _flash_attention(q, k, v, scale)
            return out.transpose(0, 2, 1, 3).reshape(B, N, h * d)
    out = _sdpa(q, k, v, scale)
    return out.transpose(0, 2, 1, 3).reshape(B, N, h * d)
