"""Golden tests: dual SegFormer encoder + MLP decoder vs reference torch modules."""
import numpy as np
import pytest
import torch

from tests.conftest import reference_path
from rgbx_semantic_segmentation_tpu import convert


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.fixture(scope="module")
def ref_mit_b0():
    reference_path()
    # reference dual_segformer reads config.feature_rectify_module at __init__
    # (dual_segformer.py:316-329); the default reference config selects FRM/FFM.
    from models.encoders.dual_segformer import mit_b0 as ref_factory
    model = ref_factory()
    model.eval()
    return model


def test_overlap_patch_embed_padding_matches_torch():
    """torch symmetric padding (k//2) vs XLA: explicit padding must match."""
    import jax
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_segformer import (
        OverlapPatchEmbed)
    reference_path()
    from models.encoders.dual_segformer import OverlapPatchEmbed as RefOPE

    rng = np.random.RandomState(0)
    x = rng.randn(1, 33, 47, 3).astype(np.float32)  # odd sizes stress padding
    tmod = RefOPE(patch_size=7, stride=4, in_chans=3, embed_dim=16).eval()
    fmod = OverlapPatchEmbed(patch_size=7, stride=4, embed_dim=16)
    variables = fmod.init(jax.random.PRNGKey(0), x)
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    out, H, W = fmod.apply(variables, x)
    with torch.no_grad():
        ref, Hr, Wr = tmod(_nchw(x))
    assert (H, W) == (Hr, Wr)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-3)


def test_block_golden():
    import jax
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_segformer import Block
    reference_path()
    from models.encoders.dual_segformer import Block as RefBlock

    dim, heads, sr, H, W = 32, 2, 4, 8, 12
    rng = np.random.RandomState(1)
    x = rng.randn(2, H * W, dim).astype(np.float32)
    tmod = RefBlock(dim=dim, num_heads=heads, qkv_bias=True, sr_ratio=sr).eval()
    fmod = Block(dim=dim, num_heads=heads, qkv_bias=True, sr_ratio=sr)
    variables = fmod.init(jax.random.PRNGKey(0), x, H, W)
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    out = fmod.apply(variables, x, H, W)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x), H, W)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-3)


def test_mit_b0_forward_golden(ref_mit_b0):
    import jax
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_segformer import mit_b0

    rng = np.random.RandomState(2)
    rgb = rng.randn(1, 64, 64, 3).astype(np.float32)
    mx = rng.randn(1, 64, 64, 3).astype(np.float32)
    fmod = mit_b0()
    variables = fmod.init(jax.random.PRNGKey(0), rgb, mx)
    loaded = convert.torch_to_flax_variables(ref_mit_b0.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    outs = fmod.apply(variables, rgb, mx)
    with torch.no_grad():
        refs = ref_mit_b0(_nchw(rgb), _nchw(mx))
    assert len(outs) == 4
    for i, (got, ref) in enumerate(zip(outs, refs)):
        np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=2e-3,
                                   err_msg=f"stage {i}")


def test_mlp_decoder_golden():
    import jax
    from rgbx_semantic_segmentation_tpu.models.decoders.mlp_decoder import (
        MLPDecoder)
    reference_path()
    from models.decoders.MLPDecoder import DecoderHead as RefHead

    rng = np.random.RandomState(3)
    chans = [32, 64, 160, 256]
    feats_nhwc = [rng.randn(2, 16 // (2 ** i), 16 // (2 ** i), c).astype(np.float32)
                  for i, c in enumerate(chans)]
    tmod = RefHead(in_channels=chans, num_classes=9, embed_dim=256,
                   norm_layer=torch.nn.BatchNorm2d).eval()
    fmod = MLPDecoder(num_classes=9, embed_dim=256)
    variables = fmod.init(jax.random.PRNGKey(0), feats_nhwc)
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    out = fmod.apply(variables, feats_nhwc)
    with torch.no_grad():
        ref = tmod([_nchw(f) for f in feats_nhwc])
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), atol=1e-3)


def test_encoder_decoder_shapes():
    """Full EncoderDecoder assembly: output at input resolution."""
    import jax
    from rgbx_semantic_segmentation_tpu.config import mfnet_config
    from rgbx_semantic_segmentation_tpu.models.builder import EncoderDecoder

    cfg = mfnet_config()
    cfg = cfg.replace(model=cfg.model.__class__(
        backbone="mit_b0", decoder="MLPDecoder", use_mixed_precision=False))
    model = EncoderDecoder(cfg=cfg)
    rgb = np.zeros((1, 64, 80, 3), np.float32)
    mx = np.zeros((1, 64, 80, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), rgb, mx)
    logits = model.apply(variables, rgb, mx)
    assert logits.shape == (1, 64, 80, 9)


def test_mit_b0pp_forward_golden():
    """pp variant (hardwired IFRM/IFFM, reference dual_segformerpp.py:314-324)
    through the encoder — covers the assembly-level wiring of the Improved
    fusion modules incl. the fused-attention dispatch in ImprovedCrossAttention
    (use_pallas=True; off-TPU it runs the custom-VJP _sdpa, same numerics).
    The reference builder cannot even construct this encoder (nothing imports
    dual_segformerpp); the module-level goldens in test_fusion_golden.py cover
    IFRM/IFFM in isolation, this covers their in-tower composition."""
    import jax
    reference_path()
    from models.encoders.dual_segformerpp import mit_b0 as ref_factory
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_segformer import (
        mit_b0)

    tmod = ref_factory()
    tmod.eval()
    rng = np.random.RandomState(4)
    rgb = rng.randn(1, 64, 64, 3).astype(np.float32)
    mx = rng.randn(1, 64, 64, 3).astype(np.float32)
    fmod = mit_b0(frm="IFRM", ffm="IFFM", use_pallas=True)
    variables = fmod.init(jax.random.PRNGKey(0), rgb, mx)
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    outs = fmod.apply(variables, rgb, mx)
    with torch.no_grad():
        refs = tmod(_nchw(rgb), _nchw(mx))
    assert len(outs) == 4
    for i, (got, ref) in enumerate(zip(outs, refs)):
        np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=2e-3,
                                   err_msg=f"stage {i}")


def test_attn_drop_training_path():
    """attn_drop > 0 trains (XLA probs-dropout path) and is identity at eval.

    Reference applies Dropout between softmax and the v-matmul
    (dual_segformer.py:131-133); no shipped config uses a non-zero rate, but
    the knob must work. Eval mode must bypass dropout entirely (fused-kernel
    dispatch), matching torch eval() semantics.
    """
    import jax
    import jax.numpy as jnp
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_segformer import (
        Attention)

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 64, 32).astype(np.float32))
    mod = Attention(32, num_heads=2, attn_drop=0.5, sr_ratio=2)
    variables = mod.init(jax.random.PRNGKey(0), x, 8, 8)

    # eval: rate ignored, equals the attn_drop=0 module bit-for-bit
    ref = Attention(32, num_heads=2, attn_drop=0.0, sr_ratio=2)
    out_eval = mod.apply(variables, x, 8, 8, train=False)
    out_ref = ref.apply(variables, x, 8, 8, train=False)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_ref))

    # train: stochastic (two dropout streams differ), finite, and grads flow
    o1 = mod.apply(variables, x, 8, 8, train=True,
                   rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = mod.apply(variables, x, 8, 8, train=True,
                   rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(o1)).all()
    assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def loss(params):
        out = mod.apply({"params": params}, x, 8, 8, train=True,
                        rngs={"dropout": jax.random.PRNGKey(3)})
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in flat)
