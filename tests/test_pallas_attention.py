"""Pallas fused SR-attention kernel: interpret-mode correctness vs XLA path."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rgbx_semantic_segmentation_tpu.ops.attention import multi_head_attention
from rgbx_semantic_segmentation_tpu.ops.pallas_attention import (
    sr_attention_pallas, supported)


@pytest.mark.parametrize("shape", [
    (2, 1, 1024, 64, 300),   # stage-1-like: N=1024, M=300 (needs M padding)
    (1, 2, 512, 32, 128),    # aligned M
    (1, 5, 640, 64, 80),     # stage-3-like head count, odd N/M
])
def test_pallas_matches_xla(shape):
    B, h, N, d, M = shape
    rng = np.random.RandomState(0)
    q = rng.randn(B, h, N, d).astype(np.float32)
    k = rng.randn(B, h, M, d).astype(np.float32)
    v = rng.randn(B, h, M, d).astype(np.float32)
    scale = d ** -0.5
    ref = multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               scale)
    got = sr_attention_pallas(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              scale, tile_n=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_bf16():
    B, h, N, d, M = 1, 1, 512, 64, 150
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, h, N, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, h, M, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, h, M, d), jnp.bfloat16)
    ref = multi_head_attention(q, k, v, d ** -0.5)
    got = sr_attention_pallas(q, k, v, d ** -0.5, tile_n=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


def test_supported_predicate():
    assert not supported((1, 1, 256, 64), (1, 1, 300, 64), backend="cpu")
    assert supported((8, 1, 19200, 64), (8, 1, 300, 64), backend="tpu")
    assert supported((8, 8, 300, 64), (8, 8, 300, 64), backend="tpu") is False
