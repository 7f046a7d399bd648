"""Window-attention kernel (ops/window_attention.py, v3) vs the XLA
composition.

Interpret mode on CPU: same kernel program as the TPU path. Shapes mirror
swin stages scaled down: qkv (S, B, T, 3C) with S = nW/P slices, T = P*N
packed tokens, 3C channels in (3, h, d) column order (heads split
in-kernel); bias (S, h, P, N, N)."""
import os

import numpy as np
import pytest

os.environ.setdefault("RGBX_PALLAS_INTERPRET", "1")

import jax
import jax.numpy as jnp

from rgbx_semantic_segmentation_tpu.ops import window_attention as WA

S, B, H, P, N, D = 2, 2, 3, 3, 49, 32
T = P * N
C = H * D
SCALE = D ** -0.5


def _inputs(seed=0, s=S, b=B, h=H, p=P, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    qkv = jnp.asarray(rng.randn(s, b, p * N, 3 * h * D), dtype)
    # rel-pos-like bias plus a -100 block on some slices (shifted-window
    # mask structure).
    bias = rng.randn(s, h, p, N, N).astype(np.float32)
    bias[s // 2:, :, :, :, N // 2:] += -100.0
    return qkv, jnp.asarray(bias)


def _xla_ref(qkv, bias, scale):
    """Block-diagonal reference: P windows per slice, off-diag = NEG_INF;
    heads sliced off the (3, h, d)-ordered channel dim."""
    s, b, t, c3 = qkv.shape
    h, p, n = bias.shape[1], bias.shape[2], bias.shape[3]
    c = c3 // 3
    d = c // h
    x = qkv.reshape(s, b, t, 3, h, d)
    q, k, v = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]  # (s,b,t,h,d)
    big = jnp.full((s, h, t, t), WA.NEG_INF, jnp.float32)
    for pi in range(p):
        big = big.at[:, :, pi * n:(pi + 1) * n, pi * n:(pi + 1) * n].set(
            bias[:, :, pi])
    logits = jnp.einsum("sbnhd,sbmhd->sbhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + big[:, None]
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("sbhnm,sbmhd->sbnhd", probs, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out.reshape(s, b, t, c)


def test_forward_matches_xla():
    qkv, bias = _inputs()
    seed = jnp.zeros((1,), jnp.int32)
    out = WA.window_attention(qkv, bias, seed, SCALE, 0.0, True)
    ref = _xla_ref(qkv, bias, SCALE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_forward_unpacked_p1():
    qkv, bias = _inputs(7, s=5, b=1, h=2, p=1)
    seed = jnp.zeros((1,), jnp.int32)
    out = WA.window_attention(qkv, bias, seed, SCALE, 0.0, True)
    ref = _xla_ref(qkv, bias, SCALE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_grads_match_xla():
    qkv, bias = _inputs(1)
    seed = jnp.zeros((1,), jnp.int32)

    def loss_kernel(qkv, bias):
        out = WA.window_attention(qkv, bias, seed, SCALE, 0.0, True)
        return jnp.sum(out * out)

    def loss_ref(qkv, bias):
        out = _xla_ref(qkv, bias, SCALE)
        return jnp.sum(out * out)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(qkv, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    for name, a, b in zip("qkv bias".split(), gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=1e-4, err_msg=f"d{name}")


def test_pack_factor():
    assert WA.pack_factor(18, 49) == 3   # 5*49 > 256, 3 | 18
    assert WA.pack_factor(5, 49) == 5    # 245 <= 256
    assert WA.pack_factor(23, 49) == 1   # prime > budget
    assert WA.pack_factor(3, 144) == 1   # swin_b ws=12: 144 tokens, no pack


def _dropout_supported():
    qkv, bias = _inputs(3)
    seed = jnp.asarray([7], jnp.int32)
    try:
        WA.window_attention(qkv, bias, seed, SCALE, 0.3, True)
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _dropout_supported(),
                    reason="pltpu PRNG unsupported in interpret mode here")
def test_dropout_deterministic():
    qkv, bias = _inputs(4)
    seed = jnp.asarray([1234], jnp.int32)
    a = WA.window_attention(qkv, bias, seed, SCALE, 0.3, True)
    b = WA.window_attention(qkv, bias, seed, SCALE, 0.3, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = WA.window_attention(qkv, bias, jnp.asarray([99], jnp.int32),
                            SCALE, 0.3, True)
    assert not np.allclose(np.asarray(a), np.asarray(c))


@pytest.mark.skipif(not _dropout_supported(),
                    reason="pltpu PRNG unsupported in interpret mode here")
def test_dropout_bwd_mask_matches_fwd():
    """The VJP regenerates the dropout mask from the seed: the directional
    derivative must match finite differences of the kernel's own
    (deterministic, same-seed) forward."""
    qkv, bias = _inputs(5)
    seed = jnp.asarray([42], jnp.int32)

    def f(qkv):
        out = WA.window_attention(qkv, bias, seed, SCALE, 0.3, True)
        return jnp.sum(out * out)

    gq = jax.grad(f)(qkv)
    rng = np.random.RandomState(0)
    tang = jnp.asarray(rng.randn(*qkv.shape), qkv.dtype)
    eps = 1e-3
    num = (f(qkv + eps * tang) - f(qkv - eps * tang)) / (2 * eps)
    ana = jnp.vdot(gq, tang)
    np.testing.assert_allclose(float(num), float(ana), rtol=5e-3)


def test_swin_block_kernel_dispatch_matches_xla():
    """SwinBlock end to end (shifted variant: pad + roll + mask) with
    use_pallas routing through the whole-image kernel path (interpret) vs
    the partitioned XLA path. Geometry pads 10x13 -> 14x14: ni=2, nj=2,
    P = pack_factor(2, 49) = 2 packed windows per slice."""
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_swin import (
        SwinBlock)
    rng = np.random.RandomState(6)
    Bb, Hh, Ww, Cc = 2, 10, 13, 24
    x = jnp.asarray(rng.randn(Bb, Hh * Ww, Cc), jnp.float32)
    kw = dict(dim=Cc, num_heads=4, window_size=7, shift_size=3)
    ref_mod = SwinBlock(use_pallas=False, **kw)
    var = ref_mod.init(jax.random.PRNGKey(0), x, Hh, Ww)
    ref = ref_mod.apply(var, x, Hh, Ww)
    out = SwinBlock(use_pallas=True, **kw).apply(var, x, Hh, Ww)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)


def _data_mesh():
    from rgbx_semantic_segmentation_tpu.parallel import mesh as mesh_lib
    return mesh_lib.make_mesh()  # 1-D ('data',) over the 8 CPU devices


def test_sharded_matches_direct():
    """window_attention_sharded (batch on 'data', psum'd bias grad) must
    reproduce the direct kernel exactly: fwd and both grads."""
    mesh = _data_mesh()
    nd = int(np.prod(list(mesh.shape.values())))
    qkv, bias = _inputs(11, b=nd)
    seed = jnp.zeros((1,), jnp.int32)

    def loss_direct(qkv, bias):
        out = WA.window_attention(qkv, bias, seed, SCALE, 0.0, True)
        return jnp.sum(out * out)

    def loss_sharded(qkv, bias):
        out = WA.window_attention_sharded(qkv, bias, seed, SCALE, 0.0,
                                          mesh, "data", interpret=True)
        return jnp.sum(out * out)

    out_d = WA.window_attention(qkv, bias, seed, SCALE, 0.0, True)
    out_s = WA.window_attention_sharded(qkv, bias, seed, SCALE, 0.0, mesh,
                                        "data", interpret=True)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               atol=2e-5, rtol=1e-5)
    gd = jax.grad(loss_direct, argnums=(0, 1))(qkv, bias)
    gs = jax.grad(loss_sharded, argnums=(0, 1))(qkv, bias)
    for name, a, b in zip(("qkv", "bias"), gs, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=1e-4, err_msg=f"d{name} sharded")


def test_mesh_plan_routing():
    mesh = _data_mesh()
    nd = int(np.prod(list(mesh.shape.values())))
    assert WA.mesh_plan(4)[0] == "direct"          # no mesh context
    with mesh:
        kind, spec, _ = WA.mesh_plan(nd)           # divisible batch
        assert kind == "sharded" and spec[1] == "data"
        assert WA.mesh_plan(nd + 1) is None        # indivisible -> XLA
    # Mixed data x spatial mesh: the kernel's shard_map would replicate
    # qkv over 'spatial' (all-gather + redundant compute) — XLA composition
    # keeps the spatial activation sharding instead (regression).
    from rgbx_semantic_segmentation_tpu.parallel import mesh as mesh_lib
    mesh2 = mesh_lib.make_mesh_2d(2, nd // 2)
    with mesh2:
        assert WA.mesh_plan(4) is None


def test_swin_block_sharded_dispatch_matches_xla():
    """SwinBlock under an active data mesh routes through
    window_attention_sharded and must match the XLA composition."""
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_swin import (
        SwinBlock)
    mesh = _data_mesh()
    nd = int(np.prod(list(mesh.shape.values())))
    rng = np.random.RandomState(9)
    Bb, Hh, Ww, Cc = nd, 10, 13, 24
    x = jnp.asarray(rng.randn(Bb, Hh * Ww, Cc), jnp.float32)
    kw = dict(dim=Cc, num_heads=4, window_size=7, shift_size=3)
    ref_mod = SwinBlock(use_pallas=False, **kw)
    var = ref_mod.init(jax.random.PRNGKey(0), x, Hh, Ww)
    ref = ref_mod.apply(var, x, Hh, Ww)
    with mesh:
        out = SwinBlock(use_pallas=True, **kw).apply(var, x, Hh, Ww)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)


def test_swin_block_kernel_dispatch_unshifted():
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_swin import (
        SwinBlock)
    rng = np.random.RandomState(8)
    Bb, Hh, Ww, Cc = 1, 21, 14, 16
    x = jnp.asarray(rng.randn(Bb, Hh * Ww, Cc), jnp.float32)
    kw = dict(dim=Cc, num_heads=2, window_size=7, shift_size=0)
    ref_mod = SwinBlock(use_pallas=False, **kw)
    var = ref_mod.init(jax.random.PRNGKey(0), x, Hh, Ww)
    ref = ref_mod.apply(var, x, Hh, Ww)
    out = SwinBlock(use_pallas=True, **kw).apply(var, x, Hh, Ww)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)
