"""Golden tests for the short-kv SR-attention Pallas kernel
(ops/sr_attention.py) against the XLA reference path (ops/attention._sdpa),
forward and backward, in Pallas interpret mode on CPU.

The kernel is the fused compute path for every attention in the MiT/CMX
encoder (reference dual_segformer.py:77-138 — all shapes are short-kv after
the spatial-reduction conv). Shapes cover the four mit_b2 stage geometries
(scaled down), a non-multiple-of-8 N (single partial tile), M=1 (stage-1 SR
output of a tiny image), and d=32.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbx_semantic_segmentation_tpu.ops import sr_attention as S
from rgbx_semantic_segmentation_tpu.ops.attention import _sdpa

SHAPES = [
    (2, 1, 480, 300, 64),   # stage-1-like: big N, h=1
    (2, 2, 300, 300, 64),   # N == M, partial 300-row tile (no mult-of-8 div)
    (1, 5, 96, 24, 32),     # d=32, h=5
    (2, 1, 8, 1, 64),       # M=1 (tiny-image SR output), heavy kv padding
    (1, 8, 75, 19, 64),     # N and M both non-multiples of 8
]


def _mk(shape, seed):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(*shape), jnp.float32).astype(jnp.bfloat16)


@pytest.mark.parametrize("B,h,N,M,d", SHAPES)
def test_forward_matches_xla(B, h, N, M, d):
    q = _mk((B, h, N, d), 0)
    k = _mk((B, h, M, d), 1)
    v = _mk((B, h, M, d), 2)
    scale = d ** -0.5
    ref = _sdpa(q, k, v, scale)
    got = S.sr_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-3, rtol=0)


@pytest.mark.parametrize("B,h,N,M,d", SHAPES)
def test_gradients_match_xla(B, h, N, M, d):
    q = _mk((B, h, N, d), 3)
    k = _mk((B, h, M, d), 4)
    v = _mk((B, h, M, d), 5)
    scale = d ** -0.5
    # Non-uniform cotangent so dq/dk get real signal (a constant cotangent
    # makes softmax-bwd vanish).
    w = _mk((B, h, N, d), 6).astype(jnp.float32)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v).astype(jnp.float32) * w)
        return f

    ref = jax.grad(loss(lambda q, k, v: _sdpa(q, k, v, scale)),
                   argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(
        loss(lambda q, k, v: S.sr_attention(q, k, v, scale, interpret=True)),
        argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", got, ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-2, rtol=2e-2, err_msg=f"d{name}")


def test_supported_gate():
    assert S.supported((8, 1, 19200, 64), (8, 1, 300, 64))
    assert S.supported((8, 8, 300, 128), (8, 8, 300, 128))
    # long kv: beyond the whole-kv-in-VMEM bound -> flash/XLA territory
    assert not S.supported((8, 1, 4096, 64), (8, 1, 4096, 64))
    # wide head dim unsupported
    assert not S.supported((8, 1, 1024, 256), (8, 1, 300, 256))


def test_tile_n_divides():
    for n in (19200, 4800, 1200, 300, 75, 8, 16, 512, 1000):
        t = S._tile_n(n)
        assert n % t == 0, (n, t)
        assert t <= 1024 or t == n
