"""Fused window-attention Pallas kernel (Swin W-MSA / SW-MSA), v3.

The Swin towers' hot op is tens of thousands of tiny (N=ws^2=49, d=32)
self-attentions with a trainable relative-position bias and (for shifted
blocks) an additive window mask (reference dual_swin.py:77-155). Two
structural problems make the XLA lowering slow on TPU:

 1. Residual bloat: autodiff keeps the fp32 probs (padded 49->56x128 by the
    TPU tile layout) plus the attn-dropout mask — ~14 GB of residuals at
    swin_s b8 480x640, forcing involuntary rematerialization (110 ms/step of
    `copy` ops; history in docs/PERF.md "Swin").
 2. Tiny units: a (49, 32) matmul under-fills the MXU ~12x and every
    window/head/batch slice is its own serial chain.

v2 fixed (1) and (2) (probs/mask never in HBM; P windows packed
block-diagonally into T = P*N-token units) but its kernel layout
(G=(nW/P)*h slice-major, components/heads split OUT of the channel dim)
made the XLA pack/unpack transposes move d=32 bf16 (64-byte) runs —
~135 ms/step of layout copies at swin_s b8, the single largest line of the
step (docs/PERF.md "Swin").

v3 keeps the image's CHANNEL DIM INTACT through the layout transition and
splits components/heads INSIDE the kernel:

  - qkv stays (S, B, T, 3C) with the dense layer's native (3, h, d) column
    order (= torch's qkv weight layout, so convert.py is unaffected): the
    pack transpose becomes a pure token regrouping with ws*3C-contiguous
    runs (~4 KB at stage 1 vs 64 B in v2 — DMA at bandwidth instead of
    gather speed), and the unpack the same with ws*C runs.
  - The kernel slices q/k/v per head off the lane dim in VMEM (static
    32-lane-aligned value slices -> in-register relayouts, VPU-cheap) and
    loops heads in-program; per-head outputs are concatenated back to one
    (T, C) lane-contiguous store.
  - P consecutive windows run as ONE block-diagonal attention of T = P*N
    tokens (off-diagonal token pairs get NEG_INF): fewer, bigger serial
    units. The block-diagonal bias is assembled in VMEM per (slice, head)
    from compact (P, N, N) blocks.
  - The trainable bias gets a real gradient: the diagonal blocks of the
    unscaled dlogits accumulate over the batch grid dim in fp32 scratch
    (batch grid dim is 'arbitrary' = sequential; bias blocks have a
    constant index over it, so Mosaic's revolving buffers fetch each once).
    The caller's bias construction (rel-pos gather + shift-mask add) stays
    in XLA, so d(table) falls out of autodiff.
  - Attention dropout runs INSIDE the kernel from the on-core PRNG, seeded
    per (slice, head, batch): the backward regenerates the identical
    keep-mask instead of saving it. Residual = (qkv, bias, seed) only;
    probs and mask never exist in HBM in either pass.
  - Self-attention per slice => dq/dk/dv are written directly by each grid
    step into one packed (T, 3C) dqkv row; no cross-step accumulation.

Numerics: fp32 logits (scale applied to fp32 logits, then + fp32 bias), fp32
softmax, bf16 probs into the pv matmul; dropout masks the bf16 probs and
scales by 1/keep.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rgbx_semantic_segmentation_tpu.ops.sr_attention import NEG_INF

# Per-grid-step work target in (head x token) rows; env-overridable for
# tuning runs. One grid step processes gs slices x h heads x T tokens.
_FWD_TARGET = int(os.environ.get("RGBX_WIN_FWD_TARGET", "2560"))
_BWD_TARGET = int(os.environ.get("RGBX_WIN_BWD_TARGET", "1280"))

# Max tokens per packed slice (P windows of N tokens each, see pack_factor).
# 256 keeps the fp32 logits tile at (256, 256) = 256 KB.
_PACK_TOKENS = int(os.environ.get("RGBX_WIN_PACK_TOKENS", "256"))


def interpret_requested() -> bool:
    return bool(os.environ.get("RGBX_PALLAS_INTERPRET"))


def pack_factor(n_windows: int, n: int) -> int:
    """Largest divisor P of n_windows with P * n <= the pack-token budget."""
    best = 1
    for p in range(1, n_windows + 1):
        if n_windows % p == 0 and p * n <= _PACK_TOKENS:
            best = p
    return best


def usable(n: int, d: int, rate: float = 0.0) -> bool:
    """Kernel shape/platform predicate (mesh routing is `mesh_plan`)."""
    from rgbx_semantic_segmentation_tpu.ops.attention import _on_tpu
    del rate  # dropout is supported in-kernel
    if not (_on_tpu() or interpret_requested()):
        return False
    return n <= _PACK_TOKENS and d <= 128


def mesh_plan(batch: int):
    """How to run the kernel under the current mesh context.

    Returns ("direct", None, interpret) with no mesh, ("sharded",
    (mesh, data_axis), interpret) when the batch divides the data axis
    (pallas_call has no GSPMD rule, so mesh runs go through
    `window_attention_sharded`'s shard_map), or None -> caller should take
    the XLA composition (e.g. spatial-only sharding, indivisible batch, or
    non-TPU without interpret mode)."""
    from rgbx_semantic_segmentation_tpu.ops.attention import _on_tpu
    from rgbx_semantic_segmentation_tpu.ops.sharding import (
        _active_mesh, axis_size)
    mesh = _active_mesh()
    if mesh is None:
        return ("direct", None, interpret_requested() and not _on_tpu())
    interpret = (not _on_tpu()) and interpret_requested()
    if not (_on_tpu() or interpret):
        return None
    sp = axis_size("spatial")
    if sp is not None and sp > 1:
        # Mixed data x spatial: the kernel's shard_map in_specs would
        # replicate qkv/bias over 'spatial' (a full all-gather + redundant
        # compute per spatial shard), defeating the activation sharding the
        # 2-D mesh exists for — let the XLA composition keep the spatial
        # partitioning instead.
        return None
    da = axis_size("data")
    if da is not None and da > 1 and batch % da == 0:
        return ("sharded", (mesh, "data"), interpret)
    if int(np.prod(list(mesh.shape.values()))) == 1:
        # Degenerate 1-device mesh: trivially-replicated shard_map body.
        return ("sharded", (mesh, None), interpret)
    return None


def _s_block(s: int, t: int, h: int, target: int) -> int:
    """Slices gs per grid step so that gs*h*t ~ target head-token rows:
    amortises the fixed per-grid-step cost where slices are small. Must
    divide s."""
    gs = min(s, max(1, target // max(1, h * t)))
    while s % gs:
        gs -= 1
    return gs


def _thr(rate: float) -> np.uint32:
    return np.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))


def _block_diag_bias(b_ref, gi, hi, P, N):
    """Assemble the (T, T) block-diagonal bias in VMEM from P (N, N) blocks;
    off-diagonal positions get NEG_INF (zero attention after softmax)."""
    T = P * N
    if P == 1:
        return b_ref[gi, hi, 0]
    rows = []
    for p in range(P):
        rows.append(jnp.pad(b_ref[gi, hi, p],
                            ((0, 0), (p * N, T - (p + 1) * N)),
                            constant_values=NEG_INF))
    return jnp.concatenate(rows, axis=0)


def _probs_f32(q, k, bias, scale):
    logits = lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    logits = logits * scale + bias
    logits -= jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _keep_mask(seed_ref, sid, g1, nb, shape, rate):
    pltpu.prng_seed(seed_ref[0], sid * nb + g1)
    bits = pltpu.prng_random_bits(shape)
    return bits.astype(jnp.uint32) >= _thr(rate)


def _fwd_kernel(seed_ref, qkv_ref, b_ref, o_ref, *, scale, gs, nb, h, d, P,
                N, rate):
    g0 = pl.program_id(0)
    g1 = pl.program_id(1)
    C = h * d
    for gi in range(gs):
        x = qkv_ref[gi, 0]                       # (T, 3C), (3, h, d) order
        outs = []
        for hi in range(h):
            q = x[:, hi * d:(hi + 1) * d]
            k = x[:, C + hi * d:C + (hi + 1) * d]
            v = x[:, 2 * C + hi * d:2 * C + (hi + 1) * d]
            bias = _block_diag_bias(b_ref, gi, hi, P, N)
            pf = _probs_f32(q, k, bias, scale)
            p = pf.astype(x.dtype)
            if rate > 0.0:
                sid = (g0 * gs + gi) * h + hi
                keep = _keep_mask(seed_ref, sid, g1, nb, pf.shape, rate)
                p = jnp.where(keep, p * (1.0 / (1.0 - rate)),
                              0.0).astype(x.dtype)
            outs.append(lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        o_ref[gi, 0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, qkv_ref, b_ref, g_ref, dqkv_ref, db_ref, db_acc, *,
                scale, gs, nb, h, d, P, N, rate):
    g0 = pl.program_id(0)
    g1 = pl.program_id(1)
    C = h * d

    @pl.when(g1 == 0)
    def _():
        db_acc[:] = jnp.zeros_like(db_acc)

    for gi in range(gs):
        x = qkv_ref[gi, 0]
        gout = g_ref[gi, 0]                      # (T, C)
        dqs, dks, dvs = [], [], []
        for hi in range(h):
            q = x[:, hi * d:(hi + 1) * d]
            k = x[:, C + hi * d:C + (hi + 1) * d]
            v = x[:, 2 * C + hi * d:2 * C + (hi + 1) * d]
            gh = gout[:, hi * d:(hi + 1) * d]
            bias = _block_diag_bias(b_ref, gi, hi, P, N)
            pf = _probs_f32(q, k, bias, scale)
            p = pf.astype(x.dtype)
            if rate > 0.0:
                inv = 1.0 / (1.0 - rate)
                sid = (g0 * gs + gi) * h + hi
                keep = _keep_mask(seed_ref, sid, g1, nb, pf.shape, rate)
                pd = jnp.where(keep, p * inv, 0.0).astype(x.dtype)
            else:
                pd = p
            # dv = Drop(p)^T @ g
            dvs.append(lax.dot_general(
                pd, gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            # d(Drop(p)) = g @ v^T; chain through dropout, then softmax.
            dp = lax.dot_general(gh, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
            if rate > 0.0:
                dp = jnp.where(keep, dp * inv, 0.0)
            dl = (dp - jnp.sum(dp * pf, axis=-1, keepdims=True)) * pf
            if P == 1:
                db_acc[gi, hi, 0] += dl
            else:
                for p_i in range(P):
                    db_acc[gi, hi, p_i] += dl[p_i * N:(p_i + 1) * N,
                                              p_i * N:(p_i + 1) * N]
            dlf = (dl * scale).astype(x.dtype)
            dqs.append(lax.dot_general(
                dlf, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dks.append(lax.dot_general(
                dlf, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        dqkv_ref[gi, 0] = jnp.concatenate(
            dqs + dks + dvs, axis=-1).astype(dqkv_ref.dtype)

    @pl.when(g1 == nb - 1)
    def _():
        db_ref[:] = db_acc[:].astype(db_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "rate", "interpret"))
def _wfwd_call(qkv, bias, seed, scale, rate, interpret=False):
    S, B, T, C3 = qkv.shape
    h, P, N = bias.shape[1], bias.shape[2], bias.shape[3]
    C = C3 // 3
    d = C // h
    gs = _s_block(S, T, h, _FWD_TARGET)
    kern = functools.partial(_fwd_kernel, scale=scale, gs=gs, nb=B, h=h, d=d,
                             P=P, N=N, rate=rate)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S // gs, B),
        in_specs=[
            pl.BlockSpec((gs, 1, T, C3), lambda g0, g1, s: (g0, g1, 0, 0)),
            pl.BlockSpec((gs, h, P, N, N),
                         lambda g0, g1, s: (g0, 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((gs, 1, T, C),
                               lambda g0, g1, s: (g0, g1, 0, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, B, T, C), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(seed, qkv, bias)


@functools.partial(jax.jit, static_argnames=("scale", "rate", "interpret"))
def _wbwd_call(qkv, bias, seed, g, scale, rate, interpret=False):
    S, B, T, C3 = qkv.shape
    h, P, N = bias.shape[1], bias.shape[2], bias.shape[3]
    C = C3 // 3
    d = C // h
    gs = _s_block(S, T, h, _BWD_TARGET)
    kern = functools.partial(_bwd_kernel, scale=scale, gs=gs, nb=B, h=h, d=d,
                             P=P, N=N, rate=rate)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S // gs, B),
        in_specs=[
            pl.BlockSpec((gs, 1, T, C3), lambda g0, g1, s: (g0, g1, 0, 0)),
            pl.BlockSpec((gs, h, P, N, N),
                         lambda g0, g1, s: (g0, 0, 0, 0, 0)),
            pl.BlockSpec((gs, 1, T, C), lambda g0, g1, s: (g0, g1, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((gs, 1, T, C3), lambda g0, g1, s: (g0, g1, 0, 0)),
            pl.BlockSpec((gs, h, P, N, N),
                         lambda g0, g1, s: (g0, 0, 0, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((gs, h, P, N, N), jnp.float32)],
    )
    dqkv, db = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((S, B, T, C3), qkv.dtype),
            jax.ShapeDtypeStruct((S, h, P, N, N), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(seed, qkv, bias, g)
    return dqkv, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def window_attention(qkv, bias, seed, scale, rate, interpret=False):
    """Fused packed windowed self-attention with additive bias and dropout.

    qkv: (S, B, T, 3C) with S = nW/P slices, T = P*N tokens (P windows
    packed block-diagonally), 3C channels in the dense layer's native
    (3, h, d) column order — heads are split in-kernel.
    bias: (S, h, P, N, N) fp32 — per-(window, head) combined rel-pos
    (+ shift-mask) bias; off-diagonal window pairs are masked in-kernel.
    seed: (1,) int32 — dropout stream seed (ignored when rate == 0).
    Returns (S, B, T, C) with (h, d) channel order (= concat-heads, the
    proj layer's input order); differentiable in qkv/bias (custom VJP,
    probs recomputed in VMEM, dropout mask regenerated from the seed).
    """
    return _wfwd_call(qkv, bias, seed, scale, rate, interpret)


def _fwd_rule(qkv, bias, seed, scale, rate, interpret):
    out = _wfwd_call(qkv, bias, seed, scale, rate, interpret)
    return out, (qkv, bias, seed)


def _bwd_rule(scale, rate, interpret, res, g):
    qkv, bias, seed = res
    dqkv, db = _wbwd_call(qkv, bias, seed, g.astype(qkv.dtype), scale, rate,
                          interpret)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dqkv, db.astype(bias.dtype), dseed


window_attention.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Mesh (GSPMD) integration: pallas_call has no SPMD partitioning rule, so
# under a device mesh the kernel is explicitly shard_mapped (mirrors
# sr_attention_sharded). Window attention is purely window-local, so the
# natural layout shards the batch dim (dim 1 of the packed qkv) on the data
# axis with slices/bias replicated: fwd and dqkv need no collectives at all;
# only the trainable-bias grad is a sum over the batch -> one psum over the
# data axis in the backward. The in-kernel dropout stream folds only the
# LOCAL batch index, so the seed is offset per shard to decorrelate the
# streams.
# ---------------------------------------------------------------------------


def _wa_make_sharded(mesh, data_axis, scale, rate, interpret):
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    qs = P(None, data_axis, None, None)         # (S, B, T, 3C)
    bs = P(None, None, None, None, None)        # bias replicated
    ss = P(None)                                # seed replicated
    outs = P(None, data_axis, None, None)       # (S, B, T, C)

    def _local_seed(seed):
        if rate > 0.0 and data_axis is not None:
            shard = lax.axis_index(data_axis).astype(jnp.int32)
            seed = seed + shard * jnp.int32(1000003)
        return seed

    def _map(fn, in_specs, out_specs):
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)

    @jax.custom_vjp
    def attn(qkv, bias, seed):
        return _map(
            lambda qkv, bias, seed: _wfwd_call(
                qkv, bias, _local_seed(seed), scale, rate, interpret),
            (qs, bs, ss), outs)(qkv, bias, seed)

    def fwd(qkv, bias, seed):
        return attn(qkv, bias, seed), (qkv, bias, seed)

    def bwd(res, g):
        qkv, bias, seed = res

        def body(qkv, bias, seed, g):
            dqkv, db = _wbwd_call(qkv, bias, _local_seed(seed),
                                  g.astype(qkv.dtype), scale, rate, interpret)
            if data_axis is not None:
                db = lax.psum(db, data_axis)  # bias grad sums over the batch
            return dqkv, db

        dqkv, db = _map(body, (qs, bs, ss, outs), (qs, bs))(
            qkv, bias, seed, g)
        dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
        return dqkv, db.astype(bias.dtype), dseed

    attn.defvjp(fwd, bwd)
    return attn


def window_attention_sharded(qkv, bias, seed, scale, rate, mesh,
                             data_axis, interpret: bool = False):
    """`window_attention` under an active device mesh via shard_map: batch
    (dim 1 of qkv) sharded on `data_axis`, slices/bias/seed replicated, bias
    grad psum'd over the data axis. The caller guarantees divisibility
    (mesh_plan's batch gate)."""
    return _wa_make_sharded(mesh, data_axis, scale, rate, interpret)(
        qkv, bias, seed)
