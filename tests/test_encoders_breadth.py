"""Tests for the Swin / SegNeXt / ResNet dual encoders and ASPP variants."""
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


# ------------------------------------------------------------------ swin ----

def test_window_attention_golden():
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_swin import (
        WindowAttention)
    reference_path()
    from models.encoders.dual_swin import WindowAttention as RefWA

    dim, heads, ws = 32, 4, 7
    rng = np.random.RandomState(0)
    x = rng.randn(4, ws * ws, dim).astype(np.float32)
    tmod = RefWA(dim, (ws, ws), heads).eval()
    fmod = WindowAttention(dim, ws, heads)
    variables = fmod.init(jax.random.PRNGKey(0), x)
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    out = fmod.apply(variables, x)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_swin_block_shifted_golden():
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_swin import (
        SwinBlock)
    reference_path()
    from models.encoders.dual_swin import (
        SwinTransformerBlock as RefBlock, window_partition)

    dim, heads, ws, H, W = 32, 4, 7, 10, 13  # non-multiple sizes stress padding
    rng = np.random.RandomState(1)
    x = rng.randn(2, H * W, dim).astype(np.float32)
    tmod = RefBlock(dim=dim, num_heads=heads, window_size=ws,
                    shift_size=ws // 2).eval()
    tmod.H, tmod.W = H, W
    # reference computes the mask in BasicLayer; rebuild it the same way
    shift = ws // 2
    Hp = int(np.ceil(H / ws)) * ws
    Wp = int(np.ceil(W / ws)) * ws
    img_mask = torch.zeros((1, Hp, Wp, 1))
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mw = window_partition(img_mask, ws).view(-1, ws * ws)
    attn_mask = mw.unsqueeze(1) - mw.unsqueeze(2)
    attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0).masked_fill(
        attn_mask == 0, 0.0)

    fmod = SwinBlock(dim=dim, num_heads=heads, window_size=ws,
                     shift_size=ws // 2)
    variables = fmod.init(jax.random.PRNGKey(0), x, H, W)
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    out = fmod.apply(variables, x, H, W)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x), attn_mask)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_dual_swin_tiny_forward():
    """Full dual Swin on small depths: shape check + finite."""
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_swin import (
        DualSwinTransformer)

    model = DualSwinTransformer(embed_dim=32, depths=(1, 1, 1, 1),
                                num_heads=(1, 2, 4, 8), window_size=7)
    rng = np.random.RandomState(2)
    rgb = rng.randn(1, 64, 64, 3).astype(np.float32)
    outs, _ = model.init_with_output(jax.random.PRNGKey(0), rgb, rgb)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 32), (1, 8, 8, 64), (1, 4, 4, 128), (1, 2, 2, 256)]
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_swin_matches_reference_full():
    """Golden full-tower test on a small custom config shared by both impls."""
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_swin import (
        DualSwinTransformer)
    reference_path()
    from models.encoders.dual_swin import DualSwinTransformer as RefSwin

    kw = dict(embed_dim=32, depths=[2, 2], num_heads=[2, 4], window_size=7)
    tmod = RefSwin(pretrain_img_size=64, patch_size=4, in_chans=3,
                   drop_path_rate=0.0, out_indices=(0, 1), **kw)
    # reference overrides train() without returning self (dual_swin.py:680-683),
    # so .eval() chaining yields None — call it separately.
    tmod.eval()
    fmod = DualSwinTransformer(embed_dim=32, depths=(2, 2), num_heads=(2, 4),
                               window_size=7, drop_path_rate=0.0,
                               out_indices=(0, 1))
    rng = np.random.RandomState(3)
    rgb = rng.randn(1, 56, 56, 3).astype(np.float32)
    mx = rng.randn(1, 56, 56, 3).astype(np.float32)
    variables = fmod.init(jax.random.PRNGKey(0), rgb, mx)
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    outs = fmod.apply(variables, rgb, mx)
    with torch.no_grad():
        refs = tmod(_nchw(rgb), _nchw(mx))
    for i, (got, ref) in enumerate(zip(outs, refs)):
        np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=2e-3,
                                   err_msg=f"stage {i}")


# --------------------------------------------------------------- segnext ----

def test_segnext_forward_shapes():
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_segnext import (
        SegNextEncoder)

    model = SegNextEncoder(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128))
    rng = np.random.RandomState(4)
    rgb = rng.randn(1, 64, 64, 3).astype(np.float32)
    outs, _ = model.init_with_output(jax.random.PRNGKey(0), rgb, rgb)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 16), (1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 128)]


def test_msca_golden():
    """MSCA strip-conv attention vs the reference module (CPU-safe)."""
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_segnext import MSCA
    reference_path()
    from models.encoders.dual_segnext import MSCA as RefMSCA

    dim = 16
    rng = np.random.RandomState(5)
    x = rng.randn(2, 24, 24, dim).astype(np.float32)
    tmod = RefMSCA(dim).eval()
    fmod = MSCA(dim)
    variables = fmod.init(jax.random.PRNGKey(0), x)
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    out = fmod.apply(variables, x)
    with torch.no_grad():
        ref = tmod(_nchw(x))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), atol=1e-4)


# ---------------------------------------------------------------- resnet ----

class _TorchBottleneck(torch.nn.Module):
    """torchvision Bottleneck semantics (torchvision isn't in this image)."""

    def __init__(self, in_ch, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(in_ch, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(planes * 4)
        self.relu = torch.nn.ReLU()
        if downsample:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(in_ch, planes * 4, 1, stride, bias=False),
                torch.nn.BatchNorm2d(planes * 4))
        else:
            self.downsample = None

    def forward(self, x):
        idn = x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.downsample is not None:
            idn = self.downsample(x)
        return self.relu(y + idn)


def test_resnet_bottleneck_golden():
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_resnet import (
        Bottleneck)

    tmod = _TorchBottleneck(64, 32, stride=2, downsample=True).eval()
    # rename downsample.{0,1} keys to match the flax names downsample_{0,1}
    sd = tmod.state_dict()
    fmod = Bottleneck(planes=32, stride=2, has_downsample=True)
    rng = np.random.RandomState(6)
    x = rng.randn(1, 16, 16, 64).astype(np.float32)
    variables = fmod.init(jax.random.PRNGKey(0), x)
    loaded = convert.torch_to_flax_variables(sd)
    variables = convert.merge_variables(variables, loaded, strict=True)
    out = fmod.apply(variables, x)
    with torch.no_grad():
        ref = tmod(_nchw(x))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), atol=1e-4)


def test_resnet_tower_shapes():
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_resnet import (
        ResNetTower)

    fmod = ResNetTower(layers=(2, 2, 2, 2))
    rng = np.random.RandomState(6)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    outs, _ = fmod.init_with_output(jax.random.PRNGKey(0), x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024), (1, 2, 2, 2048)]


def test_dual_resnet_builder():
    from rgbx_semantic_segmentation_tpu.config import (
        mfnet_config, ModelConfig, DatasetConfig)
    from rgbx_semantic_segmentation_tpu.models.builder import EncoderDecoder

    cfg = mfnet_config().replace(
        dataset=DatasetConfig(num_classes=5, image_height=64, image_width=64,
                              class_names=tuple("abcde")),
        model=ModelConfig(backbone="resnet50", decoder="MLPDecoder",
                          decoder_embed_dim=64, use_mixed_precision=False))
    model = EncoderDecoder(cfg=cfg)
    rgb = np.zeros((1, 64, 64, 3), np.float32)
    out, _ = model.init_with_output(jax.random.PRNGKey(0), rgb, rgb)
    assert out.shape == (1, 64, 64, 5)


# ------------------------------------------------------------------ aspp ----

@pytest.mark.parametrize("backbone", ["mit_b0_w_aspp", "mit_b0_w_ef_aspp",
                                      "mit_b0pp", "segnext_tiny"])
def test_builder_backbone_variants(backbone):
    from rgbx_semantic_segmentation_tpu.config import (
        mfnet_config, ModelConfig, DatasetConfig)
    from rgbx_semantic_segmentation_tpu.models.builder import EncoderDecoder

    cfg = mfnet_config().replace(
        dataset=DatasetConfig(num_classes=5, image_height=64, image_width=64,
                              class_names=tuple("abcde")),
        model=ModelConfig(backbone=backbone, decoder="MLPDecoder",
                          decoder_embed_dim=64, use_mixed_precision=False))
    model = EncoderDecoder(cfg=cfg)
    rgb = np.zeros((1, 64, 64, 3), np.float32)
    out, _ = model.init_with_output(jax.random.PRNGKey(0), rgb, rgb)
    assert out.shape == (1, 64, 64, 5)


def test_stage_aspp_golden():
    from rgbx_semantic_segmentation_tpu.models.encoders.aspp import StageASPP
    reference_path()
    from models.encoders.dual_segformer_w_aspp import ASPP as RefASPP

    dim = 16
    rng = np.random.RandomState(7)
    x = rng.randn(1, 12, 12, dim).astype(np.float32)
    tmod = RefASPP(dim, [3, 6, 9]).eval()
    fmod = StageASPP(dim, (3, 6, 9))
    variables = fmod.init(jax.random.PRNGKey(0), x)
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    out = fmod.apply(variables, x)
    with torch.no_grad():
        ref = tmod(_nchw(x))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), atol=1e-4)


def test_easpp_golden():
    from rgbx_semantic_segmentation_tpu.models.encoders.aspp import EASPP
    reference_path()
    from models.encoders.dual_segformer_w_ef_aspp import eASPP as RefEASPP

    dim = 32
    rng = np.random.RandomState(8)
    x = rng.randn(1, 8, 8, dim).astype(np.float32)
    tmod = RefEASPP(dim, [12, 24, 36]).eval()
    fmod = EASPP(dim, (12, 24, 36))
    variables = fmod.init(jax.random.PRNGKey(0), x)
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    out = fmod.apply(variables, x)
    with torch.no_grad():
        ref = tmod(_nchw(x))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), atol=1e-4)


def test_dualpath_duplication_rules():
    sd = {"patch_embed1.proj.weight": np.zeros((4, 3, 7, 7)),
          "block1.0.attn.q.weight": np.zeros((4, 4)),
          "norm1.weight": np.zeros(4)}
    dup = convert.duplicate_dual_path(sd)
    assert "extra_patch_embed1.proj.weight" in dup
    assert "extra_block1.0.attn.q.weight" in dup
    assert "extra_norm1.weight" in dup

    swin_sd = {"layers.0.downsample.reduction.weight": np.zeros((8, 16)),
               "layers.0.blocks.0.attn.qkv.weight": np.zeros((12, 4)),
               "patch_embed.proj.weight": np.zeros((4, 3, 4, 4)),
               "norm0.weight": np.zeros(4)}
    dup = convert.duplicate_dual_path_swin(swin_sd)
    assert "downsamples.0.reduction.weight" in dup
    assert "downsamples_d.0.reduction.weight" in dup
    assert "layers_d.0.blocks.0.attn.qkv.weight" in dup
    assert "patch_embed_d.proj.weight" in dup
    assert "norm_d0.weight" in dup
