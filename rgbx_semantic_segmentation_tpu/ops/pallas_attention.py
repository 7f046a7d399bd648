"""Fused Pallas TPU kernel for spatial-reduction attention.

The MiT encoder's hot op (reference dual_segformer.py:116-138): q has N tokens,
k/v are sr-conv downsampled to M = N / r^2 tokens, so the attention matrix is
(N x M) with small M (e.g. stage 1 at 480x640: N=19200, M=300). The XLA path
materialises the (B, h, N, M) fp32 probs in HBM between the two matmuls; this
kernel keeps each (TILE_N x M) logits block in VMEM, fusing
matmul -> scale -> softmax -> matmul into one pass over N tiles.

k/v fit in VMEM whole (M*d <= ~1.2k * 128 even for stage 3), so no online
softmax is needed — a single-block softmax per tile is exact.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, m_valid: int):
    """One (TILE_N, d) query tile against the full (M, d) k/v."""
    q = q_ref[0]                                   # (TILE_N, d)
    k = k_ref[0]                                   # (M_pad, d)
    v = v_ref[0]                                   # (M_pad, d)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (TILE_N, M_pad)
    m_pad = k.shape[0]
    if m_valid < m_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < m_valid, logits, -1e30)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "tile_n", "interpret"))
def sr_attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        scale: float, tile_n: int = 512,
                        interpret: bool = False) -> jnp.ndarray:
    """Fused softmax attention. q: (B, h, N, d); k, v: (B, h, M, d).
    Returns (B, N, h*d) like ops.attention.multi_head_attention."""
    B, h, N, d = q.shape
    M = k.shape[2]
    dtype = q.dtype

    # Pad to hardware tiles: N to tile_n, M to 128 lanes, d to 128.
    n_pad = _round_up(N, tile_n)
    m_pad = _round_up(M, 128)
    d_pad = _round_up(d, 128)
    qf = q.reshape(B * h, N, d)
    kf = k.reshape(B * h, M, d)
    vf = v.reshape(B * h, M, d)
    if n_pad != N or d_pad != d:
        qf = jnp.pad(qf, ((0, 0), (0, n_pad - N), (0, d_pad - d)))
    if m_pad != M or d_pad != d:
        kf = jnp.pad(kf, ((0, 0), (0, m_pad - M), (0, d_pad - d)))
        vf = jnp.pad(vf, ((0, 0), (0, m_pad - M), (0, d_pad - d)))

    grid = (B * h, n_pad // tile_n)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, m_valid=M),
        out_shape=jax.ShapeDtypeStruct((B * h, n_pad, d_pad), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, d_pad), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * h * n_pad * m_pad * d_pad,
            bytes_accessed=(B * h * (n_pad * d_pad * 2 + 2 * m_pad * d_pad)
                            * q.dtype.itemsize),
            transcendentals=B * h * n_pad * m_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)

    out = out[:, :N, :d].reshape(B, h, N, d)
    return out.transpose(0, 2, 1, 3).reshape(B, N, h * d)


def supported(q_shape, k_shape, backend: Optional[str] = None) -> bool:
    """Dispatch predicate: TPU backend and shapes where the fused kernel wins
    (small M fitting VMEM alongside the logits tile)."""
    if backend is None:
        backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        return False
    B, h, N, d = q_shape
    M = k_shape[2]
    m_pad = _round_up(M, 128)
    d_pad = _round_up(d, 128)
    # k + v + q tile + logits tile must fit comfortably in ~16MB VMEM.
    vmem = (2 * m_pad * d_pad + 512 * d_pad) * 2 + 512 * m_pad * 4
    return N >= 512 and vmem < 8 * 1024 * 1024
