"""Short-kv SR-attention Pallas kernel.

Every attention in the MiT/CMX encoder is SHORT-KV: the spatial-reduction
conv (reference dual_segformer.py:116-138) shrinks k/v to M = N/r^2 tokens,
and all four mit_b2 stages at 480x640 land on M = 300 (N = 19200/4800/1200/
300). The XLA lowering of that shape round-trips the fp32 logits and probs
through HBM every forward and backward — measured 25.5 ms of the 101 ms
train step (trace attribution in docs/PERF.md), on ~0.2 ms of actual MXU
FLOPs.

This kernel exploits the short kv directly, which the general flash kernel
(online softmax, kv tiling, dkv re-tiling) cannot at these shapes (measured,
docs/PERF.md "Fused-attention verdict"):

  - The WHOLE (M, d) k and v live in VMEM for the whole kernel (M <= 1024:
    <= 0.5 MB each); no online softmax is needed — each q tile sees all of
    kv, so the fp32 logits/probs tile exists only in VMEM and HBM never sees
    a (N, M) tensor in either direction.
  - Grid = (B*h, N/TILE_N). TPU grids execute sequentially on the core, so
    the backward accumulates dk/dv in fp32 VMEM scratch across the N tiles
    of one (batch, head) and writes them once at the last tile — no atomics,
    no re-tiling pass.
  - kv is padded to the 128-lane boundary once in HBM (tiny: (G, Mp, d));
    padded columns are masked to -1e9 before the softmax so they carry
    exactly zero probability, keeping results bit-comparable to the unpadded
    XLA path (same fp32 softmax, same bf16 probs into the pv matmul).

Numerics mirror ops/attention._sdpa: matmuls take bf16 inputs with fp32
accumulation (preferred_element_type), the softmax runs in fp32, and the
probs/dl tensors are cast to bf16 before the second matmul. The backward
recomputes probs from q/k in VMEM instead of saving them — the residual is
just (q, k, v, g), so the kernel also saves the 92 MB bf16 probs residual
the XLA path keeps per stage-1 call.

d <= 128 is required (d = 64 everywhere in this model family; the 64->128
lane padding costs 2x on the tiny q/dq tiles, which is noise next to the
probs traffic it deletes — unlike the r1 kernel, which padded the (N, M)
dimension itself).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
# Whole-kv-in-VMEM bound: Mp <= 1024 keeps k + v + logits tiles well under
# the ~16 MB VMEM budget with double buffering.
MAX_M_PAD = 1024
# g-block row targets (rows processed per grid step, amortising the ~2.4 us
# fixed per-step cost). Tuned on v5e (docs/PERF.md); env-overridable for
# ablation runs. bwd is lower: ~4 live fp32 logits-sized tiles per slice.
_FWD_TARGET = int(os.environ.get("RGBX_SR_FWD_TARGET", "3840"))
_BWD_TARGET = int(os.environ.get("RGBX_SR_BWD_TARGET", "1920"))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tile_n(n: int) -> int:
    """Largest sublane-aligned (multiple-of-8) divisor of n, capped at 1024 —
    tiles must divide N exactly so the backward never feeds garbage edge rows
    into the dk/dv accumulators. Falls back to a single partial tile (n
    itself) when no multiple of 8 divides n."""
    t = min(n - n % 8, 1024)
    while t >= 8:
        if n % t == 0:
            return t
        t -= 8
    return n


def _g_block(g: int, tn: int, target: int = 1920) -> int:
    """Batch gb (batch*head) slices into one grid step so that gb*tn ~ target
    rows: amortises the fixed per-grid-step cost where N (and so tn) is
    small. Must divide g."""
    gb = min(g, max(1, target // tn))
    while g % gb:
        gb -= 1
    return gb


def supported(q_shape, k_shape) -> bool:
    B, h, N, d = q_shape
    M = k_shape[2]
    return d <= 128 and _round_up(M, 128) <= MAX_M_PAD


def _mask_pad_cols(logits, m):
    """Set columns >= m (kv padding) to -1e9. Static no-op when m == Mp."""
    mp = logits.shape[-1]
    if m == mp:
        return logits
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, logits.ndim - 1)
    return jnp.where(col < m, logits, NEG_INF)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, m, gb):
    # gb (batch·head slices per grid step) amortises the fixed per-grid-step
    # cost (~2.4 us measured): the python loop unrolls to independent
    # matmul/softmax chains on resident blocks.
    for g in range(gb):
        q = q_ref[g]
        k = k_ref[g]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        logits = _mask_pad_cols(logits, m)
        logits -= jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
        o_ref[g] = jax.lax.dot_general(
            p, v_ref[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                dk_acc, dv_acc, *, scale, m, n_tiles, gb):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    for gi in range(gb):
        q = q_ref[gi]
        k = k_ref[gi]
        v = v_ref[gi]
        g = g_ref[gi]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        logits = _mask_pad_cols(logits, m)
        logits -= jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits)
        pf = e / jnp.sum(e, axis=-1, keepdims=True)
        p = pf.astype(q.dtype)

        # dv += p^T @ g   (contract the TILE_N rows)
        dv_acc[gi] += jax.lax.dot_general(
            p, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dp = g @ v^T    (TILE_N, Mp)
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dl = ((dp - jnp.sum(dp * pf, axis=-1, keepdims=True)) * pf
              * scale).astype(q.dtype)
        # dq = dl @ k     (TILE_N, d)
        dq_ref[gi] = jax.lax.dot_general(
            dl, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        # dk += dl^T @ q  (Mp, d)
        dk_acc[gi] += jax.lax.dot_general(
            dl, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(i == n_tiles - 1)
    def _():
        dk_ref[:] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[:] = dv_acc[:].astype(dv_ref.dtype)


def _pad_kv(k, v, mp):
    m = k.shape[1]
    if m != mp:
        pad = [(0, 0), (0, mp - m), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    return k, v


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _fwd_call(q, k, v, scale, interpret=False):
    G, N, d = q.shape
    M = k.shape[1]
    Mp = _round_up(max(M, 128), 128)
    tn = _tile_n(N)
    gb = _g_block(G, tn, target=_FWD_TARGET)
    k, v = _pad_kv(k, v, Mp)
    kern = functools.partial(_fwd_kernel, scale=scale, m=M, gb=gb)
    return pl.pallas_call(
        kern,
        grid=(G // gb, N // tn),
        in_specs=[
            pl.BlockSpec((gb, tn, d), lambda g, i: (g, i, 0)),
            pl.BlockSpec((gb, Mp, d), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((gb, Mp, d), lambda g, i: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((gb, tn, d), lambda g, i: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, N, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _bwd_call(q, k, v, g, scale, interpret=False):
    G, N, d = q.shape
    M = k.shape[1]
    Mp = _round_up(max(M, 128), 128)
    tn = _tile_n(N)
    n_tiles = N // tn
    gb = _g_block(G, tn, target=_BWD_TARGET)
    k, v = _pad_kv(k, v, Mp)
    kern = functools.partial(_bwd_kernel, scale=scale, m=M, n_tiles=n_tiles,
                             gb=gb)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(G // gb, n_tiles),
        in_specs=[
            pl.BlockSpec((gb, tn, d), lambda g, i: (g, i, 0)),
            pl.BlockSpec((gb, Mp, d), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((gb, Mp, d), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((gb, tn, d), lambda g, i: (g, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((gb, tn, d), lambda g, i: (g, i, 0)),
            pl.BlockSpec((gb, Mp, d), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((gb, Mp, d), lambda g, i: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, N, d), q.dtype),
            jax.ShapeDtypeStruct((G, Mp, d), k.dtype),
            jax.ShapeDtypeStruct((G, Mp, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((gb, Mp, d), jnp.float32),
            pltpu.VMEM((gb, Mp, d), jnp.float32),
        ],
        # The N-tile dim is 'arbitrary' (sequential): the dk/dv accumulators
        # carry across its iterations.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v, g)
    return dq, dk[:, :M, :], dv[:, :M, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _sr_attention_3d(q, k, v, scale, interpret):
    return _fwd_call(q, k, v, scale, interpret)


def _sr_fwd(q, k, v, scale, interpret):
    return _fwd_call(q, k, v, scale, interpret), (q, k, v)


def _sr_bwd(scale, interpret, res, g):
    q, k, v = res
    return _bwd_call(q, k, v, g.astype(q.dtype), scale, interpret)


_sr_attention_3d.defvjp(_sr_fwd, _sr_bwd)


def sr_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 scale: float, interpret: bool = False) -> jnp.ndarray:
    """Fused short-kv attention. q: (B, h, N, d); k, v: (B, h, M, d) ->
    (B, h, N, d). Requires supported(q.shape, k.shape); differentiable
    (custom VJP, probs recomputed in VMEM)."""
    B, h, N, d = q.shape
    M = k.shape[2]
    out = _sr_attention_3d(q.reshape(B * h, N, d), k.reshape(B * h, M, d),
                           v.reshape(B * h, M, d), scale, interpret)
    return out.reshape(B, h, N, d)


# ---------------------------------------------------------------------------
# Mesh (GSPMD) integration: pallas_call has no SPMD partitioning rule, so
# under a device mesh the kernel must be explicitly shard_mapped. q tiles are
# independent given the (replicated-over-token-shards) kv, so the natural
# layout is: batch sharded on the data axis, q/out tokens sharded on the
# spatial axis, kv replicated across spatial. The backward's per-shard dk/dv
# are partial sums over the local q rows -> psum over the spatial axis inside
# the shard_map body. This mirrors the sharding the Attention module pins
# with with_sharding_constraint (models/encoders/dual_segformer.py), so
# shard_map introduces no resharding of its own.
# ---------------------------------------------------------------------------


def _specs(data_axis, n_axis):
    from jax.sharding import PartitionSpec as P
    qs = P(data_axis, n_axis, None)      # (B*h, N, d) token-sharded
    ks = P(data_axis, None, None)        # (B*h, M, d) kv replicated over n
    return qs, ks


def _shmap(fn, mesh, in_specs, out_specs):
    from jax.experimental.shard_map import shard_map
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_rep=False)


def _make_sharded(mesh, data_axis, n_axis, scale, interpret):
    qs, ks = _specs(data_axis, n_axis)

    @jax.custom_vjp
    def attn(q, k, v):
        return _shmap(
            lambda q, k, v: _fwd_call(q, k, v, scale, interpret),
            mesh, (qs, ks, ks), qs)(q, k, v)

    def fwd(q, k, v):
        return attn(q, k, v), (q, k, v)

    def bwd(res, g):
        q, k, v = res

        def body(q, k, v, g):
            dq, dk, dv = _bwd_call(q, k, v, g.astype(q.dtype), scale,
                                   interpret)
            if n_axis is not None:
                # dk/dv are partial over this shard's q rows.
                dk = jax.lax.psum(dk, n_axis)
                dv = jax.lax.psum(dv, n_axis)
            return dq, dk, dv

        return _shmap(body, mesh, (qs, ks, ks, qs), (qs, ks, ks))(q, k, v, g)

    attn.defvjp(fwd, bwd)
    return attn


def sr_attention_sharded(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         scale: float, mesh, data_axis: Optional[str],
                         n_axis: Optional[str],
                         interpret: bool = False) -> jnp.ndarray:
    """sr_attention under an active device mesh via shard_map (see block
    comment above). The caller is responsible for divisibility: B*h by the
    data axis and N by the n axis (the Attention module's existing rows_ok /
    batch gates). Axis names not in the mesh must be passed as None."""
    B, h, N, d = q.shape
    M = k.shape[2]
    fn = _make_sharded(mesh, data_axis, n_axis, scale, interpret)
    out = fn(q.reshape(B * h, N, d), k.reshape(B * h, M, d),
             v.reshape(B * h, M, d))
    return out.reshape(B, h, N, d)
