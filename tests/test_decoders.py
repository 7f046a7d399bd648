"""Decoder tests: golden vs reference torch heads where CPU-safe, plus shape/
gradient checks for all heads through the builder."""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from tests.conftest import reference_path
from rgbx_semantic_segmentation_tpu import convert


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _feats(chans, base=16, batch=2, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randn(batch, base // (2 ** i), base // (2 ** i), c)
            .astype(np.float32) for i, c in enumerate(chans)]


def test_upernet_golden():
    from rgbx_semantic_segmentation_tpu.models.decoders.upernet import UPerHead
    reference_path()
    from models.decoders.UPernet import UPerHead as RefHead

    chans = [32, 64, 160, 256]
    feats = _feats(chans, base=24)
    tmod = RefHead(in_channels=chans, num_classes=9, channels=64).eval()
    fmod = UPerHead(in_channels=tuple(chans), num_classes=9, channels=64)
    variables = fmod.init(jax.random.PRNGKey(0), feats)
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    out = fmod.apply(variables, feats)
    with torch.no_grad():
        ref = tmod([_nchw(f) for f in feats])
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), atol=1e-3)


def test_deeplabv3plus_golden():
    from rgbx_semantic_segmentation_tpu.models.decoders.deeplabv3plus import (
        DeepLabV3Plus)
    reference_path()
    from models.decoders.deeplabv3plus import DeepLabV3Plus as RefHead

    chans = [32, 64, 160, 256]
    feats = _feats(chans, base=32, seed=1)
    tmod = RefHead(in_channels=chans, num_classes=9).eval()
    fmod = DeepLabV3Plus(in_channels=tuple(chans), num_classes=9)
    variables = fmod.init(jax.random.PRNGKey(0), feats)
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    out = fmod.apply(variables, feats)
    with torch.no_grad():
        ref = tmod([_nchw(f) for f in feats])
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), atol=1e-3)


def test_fcnhead_golden():
    from rgbx_semantic_segmentation_tpu.models.decoders.fcnhead import FCNHead
    reference_path()
    from models.decoders.fcnhead import FCNHead as RefHead

    rng = np.random.RandomState(2)
    x = rng.randn(2, 8, 8, 160).astype(np.float32)
    tmod = RefHead(in_channels=160, num_classes=9).eval()
    fmod = FCNHead(num_classes=9, in_index=0)
    variables = fmod.init(jax.random.PRNGKey(0), [x])
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    out = fmod.apply(variables, [x])
    with torch.no_grad():
        ref = tmod(_nchw(x))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), atol=1e-3)


def test_mlp_decoderpp_golden():
    from rgbx_semantic_segmentation_tpu.models.decoders.mlp_decoderpp import (
        MLPDecoderpp)
    reference_path()
    from models.decoders.MLPDecoderpp import DecoderHead as RefHead

    chans = [32, 64, 160, 256]
    feats = _feats(chans, base=16, seed=3)
    tmod = RefHead(in_channels=chans, num_classes=9, embed_dim=128).eval()
    fmod = MLPDecoderpp(num_classes=9, embed_dim=128)
    variables = fmod.init(jax.random.PRNGKey(0), feats)
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    out = fmod.apply(variables, feats)
    with torch.no_grad():
        ref = tmod([_nchw(f) for f in feats])
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), atol=1e-3)


def test_mask2former_shapes_and_loss():
    from rgbx_semantic_segmentation_tpu.models.decoders.mask2former import (
        Mask2Former)
    from rgbx_semantic_segmentation_tpu import losses

    chans = (32, 64, 160, 256)
    feats = _feats(list(chans), base=32, seed=4)
    fmod = Mask2Former(in_channels=chans, num_classes=5, num_queries=16,
                       num_decoder_layers=2)
    variables = fmod.init(jax.random.PRNGKey(0), feats)
    out = fmod.apply(variables, feats)
    assert out["pred_logits"].shape == (2, 16, 6)
    assert out["pred_masks"].shape == (2, 16, 32, 32)
    labels = np.random.RandomState(0).randint(0, 5, size=(2, 32, 32))
    loss = losses.mask2former_loss(out["pred_logits"], out["pred_masks"],
                                   labels, 5)
    assert np.isfinite(float(loss))


def test_resize_align_corners_matches_torch():
    from rgbx_semantic_segmentation_tpu.ops.resize import (
        resize_bilinear_align_corners)

    rng = np.random.RandomState(5)
    x = rng.randn(2, 7, 9, 3).astype(np.float32)
    out = resize_bilinear_align_corners(jnp.asarray(x), (20, 13))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(20, 13),
        mode="bilinear", align_corners=True).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_adaptive_avg_pool_matches_torch():
    from rgbx_semantic_segmentation_tpu.ops.resize import adaptive_avg_pool

    rng = np.random.RandomState(6)
    x = rng.randn(2, 15, 17, 4).astype(np.float32)
    for scale in (1, 2, 3, 6):
        out = adaptive_avg_pool(jnp.asarray(x), (scale, scale))
        ref = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), scale
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5,
                                   err_msg=f"scale {scale}")


@pytest.mark.parametrize("decoder", ["UPernet", "deeplabv3+", "MLPDecoderpp",
                                     "fcn", "mask2former"])
def test_builder_all_decoders(decoder):
    from rgbx_semantic_segmentation_tpu.config import (
        mfnet_config, ModelConfig, DatasetConfig)
    from rgbx_semantic_segmentation_tpu.models.builder import EncoderDecoder

    cfg = mfnet_config().replace(
        dataset=DatasetConfig(num_classes=5, image_height=32, image_width=32,
                              class_names=tuple("abcde")),
        model=ModelConfig(backbone="mit_b0", decoder=decoder,
                          decoder_embed_dim=64, use_mixed_precision=False))
    model = EncoderDecoder(cfg=cfg)
    rgb = np.zeros((1, 32, 32, 3), np.float32)
    out = model.init_with_output(jax.random.PRNGKey(0), rgb, rgb)[0]
    if decoder == "mask2former":
        # Eval mode composes query predictions into per-pixel scores
        # (semantic_inference); the {pred_logits, pred_masks} dict is the
        # train-mode output consumed by the loss.
        assert out.shape == (1, 32, 32, 5)
        train_out = model.apply(
            model.init(jax.random.PRNGKey(0), rgb, rgb, False), rgb, rgb, True,
            rngs={"dropout": jax.random.PRNGKey(1),
                  "droppath": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])[0]
        assert train_out["pred_logits"].shape == (1, 100, 6)
        assert train_out["pred_masks"].shape == (1, 100, 32, 32)
    elif decoder in ("UPernet", "deeplabv3+"):
        logits, aux = out
        assert logits.shape == (1, 32, 32, 5)
        assert aux.shape == (1, 32, 32, 5)
    else:
        assert out.shape == (1, 32, 32, 5)
