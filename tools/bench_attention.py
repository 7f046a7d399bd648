"""Compare SR-attention compute paths on the real TPU at mit_b2 stage shapes.

Paths: XLA einsum (current default), upstream Pallas flash-attention (kv
padded to a 128 multiple with -inf bias), and the r1 custom Pallas kernel.
fwd and fwd+bwd, batch 8. Run as: python tools/bench_attention.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters=20, warmup=3):
    import jax
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)

    B = 8
    # (name, h, N, M, d) at mit_b2 480x640 (M = N / sr^2, d = C/h)
    shapes = [
        ("stage1", 1, 19200, 300, 64),
        ("stage2", 2, 4800, 300, 64),
        ("stage3", 5, 1200, 300, 64),
        ("stage4", 8, 300, 300, 64),
    ]
    rng = np.random.RandomState(0)

    def xla_attn(q, k, v, scale):
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", probs, v,
                          preferred_element_type=jnp.float32).astype(v.dtype)

    def flash(q, k, v, scale, block_q):
        M = k.shape[2]
        Mp = -(-M // 128) * 128
        if Mp != M:
            pad = [(0, 0), (0, 0), (0, Mp - M), (0, 0)]
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
            ab = jnp.zeros((q.shape[0], q.shape[1], q.shape[2], Mp),
                           jnp.float32).at[:, :, :, M:].set(-1e9)
        else:
            ab = None
        bs = BlockSizes(
            block_q=min(block_q, q.shape[2]), block_k_major=Mp,
            block_k=Mp, block_b=1,
            block_q_major_dkv=min(block_q, q.shape[2]),
            block_k_major_dkv=Mp, block_k_dkv=Mp,
            block_q_dkv=min(block_q, q.shape[2]),
            block_k_major_dq=Mp, block_k_dq=Mp,
            block_q_dq=min(block_q, q.shape[2]))
        return flash_attention(q, k, v, ab=ab, sm_scale=scale, block_sizes=bs)

    for name, h, N, M, d in shapes:
        scale = d ** -0.5
        q = jax.device_put(rng.randn(B, h, N, d).astype(np.float32)
                           .astype(jnp.bfloat16))
        k = jax.device_put(rng.randn(B, h, M, d).astype(np.float32)
                           .astype(jnp.bfloat16))
        v = jax.device_put(rng.randn(B, h, M, d).astype(np.float32)
                           .astype(jnp.bfloat16))

        fx = jax.jit(functools.partial(xla_attn, scale=scale))
        tx = timeit(fx, (q, k, v))

        def gx(q, k, v):
            return jax.grad(lambda q, k, v: jnp.sum(
                xla_attn(q, k, v, scale).astype(jnp.float32)),
                argnums=(0, 1, 2))(q, k, v)

        tgx = timeit(jax.jit(gx), (q, k, v))

        line = f"{name} h={h} N={N} M={M}: xla fwd {tx:6.2f} bwd {tgx:6.2f}"
        try:
            ff = jax.jit(functools.partial(flash, scale=scale, block_q=512))
            # correctness first
            out_f = np.asarray(ff(q, k, v), np.float32)
            out_x = np.asarray(fx(q, k, v), np.float32)
            err = np.abs(out_f - out_x).max()
            tf = timeit(ff, (q, k, v))

            def gf(q, k, v):
                return jax.grad(lambda q, k, v: jnp.sum(
                    flash(q, k, v, scale, 512).astype(jnp.float32)),
                    argnums=(0, 1, 2))(q, k, v)

            tgf = timeit(jax.jit(gf), (q, k, v))
            line += f" | flash fwd {tf:6.2f} bwd {tgf:6.2f} (maxerr {err:.3e})"
        except Exception as e:
            line += f" | flash FAILED: {type(e).__name__}: {str(e)[:120]}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
