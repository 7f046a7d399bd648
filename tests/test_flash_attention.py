"""Fused attention path: on CPU the flash gate must be closed (falls back to
XLA exactly); the padding/gating helpers are shape-tested here. On-TPU parity
+ timing lives in tools/bench_attention.py (PARITY.md §2.10 records the
measurements)."""
import numpy as np
import jax
import jax.numpy as jnp

from rgbx_semantic_segmentation_tpu.ops import attention


def test_flash_gate_closed_on_cpu():
    assert not attention.flash_supported((8, 1, 19200, 64), (8, 1, 300, 64))


def test_xla_path_matches_manual():
    rng = np.random.RandomState(0)
    B, h, N, M, d = 2, 2, 64, 16, 32
    q = jnp.asarray(rng.randn(B, h, N, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, h, M, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, h, M, d), jnp.float32)
    scale = d ** -0.5
    out = attention.multi_head_attention(q, k, v, scale)
    logits = np.einsum("bhnd,bhmd->bhnm", q, k) * scale
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    ref = np.einsum("bhnm,bhmd->bhnd", probs, v)
    ref = ref.transpose(0, 2, 1, 3).reshape(B, N, h * d)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_round_up():
    assert attention._round_up(300, 128) == 384
    assert attention._round_up(19200, 128) == 19200


def test_improved_cross_attention_fused_dispatch_matches_naive():
    """ImprovedCrossAttention.use_pallas routes through the custom-VJP _sdpa
    (kernels gate closed off-TPU) — identical params and identical output to
    the materialising einsum path. This is the wiring that makes the 'pp'
    variants trainable at 480x640 (the naive probs tensor is f32[8,19200,19200]
    = 11 GB; measured OOM at compile, fixed by the fused dispatch)."""
    from rgbx_semantic_segmentation_tpu.models import fusion

    rng = np.random.RandomState(1)
    B, N, C = 2, 48, 32
    x1 = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    x2 = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    mod_naive = fusion.ImprovedCrossAttention(C, num_heads=4, use_pallas=False)
    mod_fused = fusion.ImprovedCrossAttention(C, num_heads=4, use_pallas=True)
    params = mod_naive.init(jax.random.PRNGKey(0), x1, x2)
    # Same param tree: use_pallas changes compute dispatch only.
    y1n, y2n = mod_naive.apply(params, x1, x2)
    y1f, y2f = mod_fused.apply(params, x1, x2)
    np.testing.assert_allclose(np.asarray(y1f), np.asarray(y1n), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y2f), np.asarray(y2n), atol=1e-5)
    # Gradients flow through the custom-VJP path.
    def loss(p):
        a, b = mod_fused.apply(p, x1, x2)
        return jnp.sum(a ** 2) + jnp.sum(b ** 2)
    g = jax.grad(loss)(params)
    assert all(np.isfinite(x).all() for x in jax.tree_util.tree_leaves(g))


def test_long_kv_block_sizes_tile_k():
    """Long-kv flash calls must tile k: one 19200-token kv major block is a
    20.6 MB scoped VMEM allocation (> 16 MB limit, measured compile failure).
    Short kv keeps the whole-kv single block (measured faster at SR shapes)."""
    assert attention._round_up(19200, 128) % 768 == 0  # the tiled bk divides
