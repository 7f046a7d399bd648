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
