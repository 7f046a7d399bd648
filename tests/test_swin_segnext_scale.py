"""Full-scale Swin golden + builder wiring + segnext tower tests (VERDICT r1 #8).

swin_s at its real configuration (96, [2,2,18,2], heads [3,6,12,24], window 7,
attn_drop_rate=0.3, reference dual_swin.py:686-690) compared against the
reference in eval mode — attn_drop=0.3 at real scale is exactly where
train/eval-mode mistakes hide.
"""
import numpy as np
import pytest
import torch
import jax

from tests.conftest import reference_path
from rgbx_semantic_segmentation_tpu import convert


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_swin_s_full_scale_golden():
    """The real swin_s tower (incl. FRM/FFM fusion) vs the reference at
    224x224 in eval mode."""
    from rgbx_semantic_segmentation_tpu.models.encoders import dual_swin

    reference_path()
    from models.encoders.dual_swin import swin_s as RefSwinS

    tmod = RefSwinS()
    tmod.eval()
    fmod = dual_swin.swin_s()

    rng = np.random.RandomState(11)
    rgb = rng.randn(1, 224, 224, 3).astype(np.float32)
    mx = rng.randn(1, 224, 224, 3).astype(np.float32)
    variables = fmod.init(jax.random.PRNGKey(0), rgb, mx)
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    outs = fmod.apply(variables, rgb, mx)
    with torch.no_grad():
        refs = tmod(_nchw(rgb), _nchw(mx))
    assert len(outs) == 4
    expect_hw = [(56, 56), (28, 28), (14, 14), (7, 7)]
    for i, (got, ref) in enumerate(zip(outs, refs)):
        got = np.asarray(got)
        assert got.shape[1:3] == expect_hw[i]
        np.testing.assert_allclose(got, _nhwc(ref), atol=5e-3,
                                   err_msg=f"stage {i}")


def test_swin_through_builder_forward():
    """swin_s selected via the builder registry: full EncoderDecoder forward
    (UPernet pairing like the reference PST900 config) with aux head."""
    from rgbx_semantic_segmentation_tpu.config import (
        DatasetConfig, ModelConfig, mfnet_config)
    from rgbx_semantic_segmentation_tpu.models.builder import build_model

    cfg = mfnet_config().replace(
        dataset=DatasetConfig(num_classes=5, image_height=64, image_width=64,
                              class_names=tuple("abcde")),
        model=ModelConfig(backbone="swin_s", decoder="UPernet",
                          use_mixed_precision=False, drop_path_rate=0.0))
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    rgb = rng.randn(1, 64, 64, 3).astype(np.float32)
    mx = rng.randn(1, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), rgb, mx, False)
    out = model.apply(variables, rgb, mx, False)
    logits, aux = out  # UPernet pairs with the aux FCN head
    assert logits.shape == (1, 64, 64, 5)
    assert aux.shape == (1, 64, 64, 5)
    assert np.isfinite(np.asarray(logits)).all()


def test_segnext_towers_untied_with_grads():
    """The reference appends the SAME Block objects to both towers
    (dual_segnext.py:305-310 — weight-tied, almost certainly a bug); here the
    towers are independent: distinct parameters, and gradients reach both."""
    import jax.numpy as jnp

    from rgbx_semantic_segmentation_tpu.models.encoders import dual_segnext

    fmod = dual_segnext.segnext_tiny()
    rng = np.random.RandomState(1)
    rgb = rng.randn(1, 64, 64, 3).astype(np.float32)
    mx = rng.randn(1, 64, 64, 3).astype(np.float32)
    variables = fmod.init(jax.random.PRNGKey(0), rgb, mx)
    params = variables["params"]

    rgb_keys = [k for k in params if k.startswith("stages_")]
    extra_keys = [k for k in params if k.startswith("extra_stages_")]
    assert rgb_keys and extra_keys
    assert len(rgb_keys) == len(extra_keys), "tower depth mismatch"

    def loss_fn(p):
        outs = fmod.apply({"params": p, **{k: v for k, v in variables.items()
                                           if k != "params"}}, rgb, mx)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    grads = jax.grad(loss_fn)(params)
    for tower in (rgb_keys, extra_keys):
        gnorm = sum(float(np.abs(np.asarray(l)).sum())
                    for k in tower
                    for l in jax.tree_util.tree_leaves(grads[k]))
        assert gnorm > 0, f"no gradient into {tower[0]} tower"

    # Shapes: 4 scales at 1/4..1/32 with the tiny dims.
    outs = fmod.apply(variables, rgb, mx)
    hw = [(16, 16), (8, 8), (4, 4), (2, 2)]
    for o, (h, w) in zip(outs, hw):
        assert np.asarray(o).shape[1:3] == (h, w)
