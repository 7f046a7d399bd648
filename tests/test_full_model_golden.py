"""Whole-model golden test: the complete reference EncoderDecoder (builder.py)
vs this framework's EncoderDecoder with converted weights — backbone + FRM/FFM +
decode head + final interpolation in one comparison."""
import numpy as np
import pytest
import torch

from tests.conftest import reference_path
from rgbx_semantic_segmentation_tpu import convert


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_full_encoder_decoder_golden():
    import jax

    reference_path()
    from easydict import EasyDict
    from models.builder import EncoderDecoder as RefModel

    ref_cfg = EasyDict(dict(
        backbone="mit_b0", decoder="MLPDecoder", decoder_embed_dim=64,
        num_classes=9, pretrained_model=None, bn_eps=1e-3, bn_momentum=0.1))
    # criterion=None skips pretrained loading + decoder re-init
    # (reference builder.py:196-197)
    tmod = RefModel(cfg=ref_cfg, criterion=None,
                    norm_layer=torch.nn.BatchNorm2d)
    tmod.eval()

    from rgbx_semantic_segmentation_tpu.config import (
        DatasetConfig, ModelConfig, mfnet_config)
    from rgbx_semantic_segmentation_tpu.models.builder import EncoderDecoder

    cfg = mfnet_config().replace(
        dataset=DatasetConfig(num_classes=9, image_height=64, image_width=64),
        model=ModelConfig(backbone="mit_b0", decoder="MLPDecoder",
                          decoder_embed_dim=64, use_mixed_precision=False,
                          gelu_approximate=False))  # erf parity vs torch
    fmod = EncoderDecoder(cfg=cfg)
    rng = np.random.RandomState(0)
    rgb = rng.randn(1, 64, 64, 3).astype(np.float32)
    mx = rng.randn(1, 64, 64, 3).astype(np.float32)
    variables = fmod.init(jax.random.PRNGKey(0), rgb, mx)
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)

    logits = fmod.apply(variables, rgb, mx)
    with torch.no_grad():
        ref = tmod(_nchw(rgb), _nchw(mx))
    assert logits.shape == (1, 64, 64, 9)
    np.testing.assert_allclose(np.asarray(logits), _nhwc(ref), atol=3e-3)
    # predictions agree everywhere that matters
    agree = (np.asarray(logits).argmax(-1) == _nhwc(ref).argmax(-1)).mean()
    assert agree > 0.999
