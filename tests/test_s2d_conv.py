"""SpaceToDepthConv: math + param-tree identity with the strided nn.Conv path.

The s2d stem experiment (ops/layers.SpaceToDepthConv, RGBX_S2D_STEM) must be a
pure schedule change: identical parameter layout (so convert.py and goldens are
untouched) and identical outputs up to float reassociation.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbx_semantic_segmentation_tpu.ops import layers as L


@pytest.mark.parametrize("k,s,cin,feat,hw", [
    (7, 4, 3, 64, (32, 48)),    # MiT stage-1 patch embed geometry
    (7, 2, 3, 64, (32, 48)),    # ResNet stem geometry
    (3, 2, 8, 16, (16, 24)),    # later-stage geometry (small C for speed)
])
def test_s2d_conv_matches_strided_conv(k, s, cin, feat, hw):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, hw[0], hw[1], cin), jnp.float32)
    p = k // 2
    ref = L.conv(feat, k, stride=s, padding=((p, p), (p, p)), name="proj")
    s2d = L.SpaceToDepthConv(feat, k, s, name="proj")
    vref = ref.init(jax.random.PRNGKey(1), x)
    vs2d = s2d.init(jax.random.PRNGKey(1), x)
    # Identical param tree (paths, shapes) -> checkpoints are interchangeable.
    assert jax.tree_util.tree_structure(vref) == jax.tree_util.tree_structure(vs2d)
    assert [a.shape for a in jax.tree_util.tree_leaves(vref)] == \
           [a.shape for a in jax.tree_util.tree_leaves(vs2d)]
    y_ref = ref.apply(vref, x)
    y_s2d = s2d.apply(vref, x)  # reference params through the s2d schedule
    assert y_s2d.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_conv_grads_match():
    k, s, cin, feat = 7, 4, 3, 32
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, cin), jnp.float32)
    p = k // 2
    ref = L.conv(feat, k, stride=s, padding=((p, p), (p, p)), name="proj")
    s2d = L.SpaceToDepthConv(feat, k, s, name="proj")
    v = ref.init(jax.random.PRNGKey(3), x)

    def loss(mod, v):
        return jnp.sum(mod.apply(v, x) ** 2)

    g_ref = jax.grad(lambda v: loss(ref, v))(v)
    g_s2d = jax.grad(lambda v: loss(s2d, v))(v)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_s2d)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_patch_embed_env_toggle_equivalence(monkeypatch):
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_segformer import (
        OverlapPatchEmbed)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 48, 3), jnp.float32)
    mod = OverlapPatchEmbed(7, 4, 64)
    monkeypatch.setenv("RGBX_S2D_STEM", "0")
    v = mod.init(jax.random.PRNGKey(5), x)
    y0, H, W = mod.apply(v, x)
    monkeypatch.setenv("RGBX_S2D_STEM", "1")
    y1, H1, W1 = mod.apply(v, x)
    assert (H, W) == (H1, W1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)


def test_s2d_conv_no_bias_resnet_stem(monkeypatch):
    """dual_resnet stem toggle: identical params and outputs (use_bias=False)."""
    from rgbx_semantic_segmentation_tpu.models.encoders import dual_resnet

    x = jax.random.normal(jax.random.PRNGKey(6), (1, 32, 32, 3), jnp.float32)
    trunk = dual_resnet.ResNetTower(layers=(1, 1, 1, 1))
    monkeypatch.setenv("RGBX_S2D_STEM", "0")
    v = trunk.init(jax.random.PRNGKey(7), x)
    y0 = trunk.apply(v, x, mutable=False)
    monkeypatch.setenv("RGBX_S2D_STEM", "1")
    v1 = trunk.init(jax.random.PRNGKey(7), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v1)
    y1 = trunk.apply(v, x, mutable=False)
    for a, b in zip(y0, y1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
