"""Golden-value tests: FRM/FFM (+ Improved variants) vs the reference torch
modules, with weights transferred through the generic converter."""
import numpy as np
import pytest
import torch

from tests.conftest import reference_path
from rgbx_semantic_segmentation_tpu import convert
from rgbx_semantic_segmentation_tpu.models import fusion

B, H, W = 2, 8, 10


@pytest.fixture(scope="module")
def ref_net_utils():
    reference_path()
    from models import net_utils
    return net_utils


def _nchw(x):  # NHWC numpy -> torch NCHW
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _nhwc(t):  # torch NCHW -> NHWC numpy
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _inputs(c, seed=0):
    rng = np.random.RandomState(seed)
    x1 = rng.randn(B, H, W, c).astype(np.float32)
    x2 = rng.randn(B, H, W, c).astype(np.float32)
    return x1, x2


def _transfer(torch_mod, flax_mod, inputs, method=None):
    """Init the flax module, overlay converted torch weights, apply."""
    import jax

    variables = flax_mod.init(jax.random.PRNGKey(0), *inputs)
    loaded = convert.torch_to_flax_variables(torch_mod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    return variables


def test_channel_weights_golden(ref_net_utils):
    dim = 16
    tmod = ref_net_utils.ChannelWeights(dim).eval()
    fmod = fusion.ChannelWeights(dim)
    x1, x2 = _inputs(dim)
    variables = _transfer(tmod, fmod, (x1, x2))
    w0, w1 = fmod.apply(variables, x1, x2)
    with torch.no_grad():
        ref = tmod(_nchw(x1), _nchw(x2))  # (2, B, C, 1, 1)
    np.testing.assert_allclose(np.asarray(w0)[:, 0, 0, :],
                               ref[0].numpy()[:, :, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(w1)[:, 0, 0, :],
                               ref[1].numpy()[:, :, 0, 0], atol=1e-5)


def test_frm_golden(ref_net_utils):
    dim = 16
    tmod = ref_net_utils.FeatureRectifyModule(dim).eval()
    fmod = fusion.FeatureRectifyModule(dim)
    x1, x2 = _inputs(dim, seed=1)
    variables = _transfer(tmod, fmod, (x1, x2))
    o1, o2 = fmod.apply(variables, x1, x2)
    with torch.no_grad():
        r1, r2 = tmod(_nchw(x1), _nchw(x2))
    np.testing.assert_allclose(np.asarray(o1), _nhwc(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o2), _nhwc(r2), atol=1e-5)


def test_ifrm_golden(ref_net_utils):
    dim = 16
    tmod = ref_net_utils.ImprovedFeatureRectifyModule(dim).eval()
    fmod = fusion.ImprovedFeatureRectifyModule(dim)
    x1, x2 = _inputs(dim, seed=2)
    variables = _transfer(tmod, fmod, (x1, x2))
    o1, o2 = fmod.apply(variables, x1, x2)
    with torch.no_grad():
        r1, r2 = tmod(_nchw(x1), _nchw(x2))
    np.testing.assert_allclose(np.asarray(o1), _nhwc(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o2), _nhwc(r2), atol=1e-5)


def test_cross_attention_golden(ref_net_utils):
    dim, heads, n = 32, 4, 40
    tmod = ref_net_utils.CrossAttention(dim, num_heads=heads).eval()
    fmod = fusion.CrossAttention(dim, num_heads=heads)
    rng = np.random.RandomState(3)
    x1 = rng.randn(B, n, dim).astype(np.float32)
    x2 = rng.randn(B, n, dim).astype(np.float32)
    variables = _transfer(tmod, fmod, (x1, x2))
    o1, o2 = fmod.apply(variables, x1, x2)
    with torch.no_grad():
        r1, r2 = tmod(torch.from_numpy(x1), torch.from_numpy(x2))
    np.testing.assert_allclose(np.asarray(o1), r1.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o2), r2.numpy(), atol=1e-5)


def test_improved_cross_attention_golden(ref_net_utils):
    dim, heads, n = 32, 4, 40
    tmod = ref_net_utils.ImprovedCrossAttention(dim, num_heads=heads).eval()
    fmod = fusion.ImprovedCrossAttention(dim, num_heads=heads)
    rng = np.random.RandomState(4)
    x1 = rng.randn(B, n, dim).astype(np.float32)
    x2 = rng.randn(B, n, dim).astype(np.float32)
    variables = _transfer(tmod, fmod, (x1, x2))
    o1, o2 = fmod.apply(variables, x1, x2)
    with torch.no_grad():
        r1, r2 = tmod(torch.from_numpy(x1), torch.from_numpy(x2))
    np.testing.assert_allclose(np.asarray(o1), r1.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o2), r2.numpy(), atol=1e-5)


def test_ffm_golden(ref_net_utils):
    dim, heads = 16, 2
    tmod = ref_net_utils.FeatureFusionModule(
        dim, reduction=1, num_heads=heads, norm_layer=torch.nn.BatchNorm2d).eval()
    fmod = fusion.FeatureFusionModule(dim, reduction=1, num_heads=heads)
    x1, x2 = _inputs(dim, seed=5)
    variables = _transfer(tmod, fmod, (x1, x2))
    out = fmod.apply(variables, x1, x2)
    with torch.no_grad():
        ref = tmod(_nchw(x1), _nchw(x2))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), atol=1e-4)


def test_iffm_golden(ref_net_utils):
    dim, heads = 16, 2
    tmod = ref_net_utils.ImprovedFeatureFusionModule(
        dim, reduction=1, num_heads=heads, norm_layer=torch.nn.BatchNorm2d).eval()
    fmod = fusion.ImprovedFeatureFusionModule(dim, reduction=1, num_heads=heads)
    x1, x2 = _inputs(dim, seed=6)
    variables = _transfer(tmod, fmod, (x1, x2))
    out = fmod.apply(variables, x1, x2)
    with torch.no_grad():
        ref = tmod(_nchw(x1), _nchw(x2))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref), atol=1e-4)


def test_ffm_train_mode_batch_stats_update(ref_net_utils):
    """In train mode the BNs must use batch stats and update running stats."""
    import jax

    dim, heads = 16, 2
    fmod = fusion.FeatureFusionModule(dim, reduction=1, num_heads=heads)
    x1, x2 = _inputs(dim, seed=7)
    variables = fmod.init(jax.random.PRNGKey(0), x1, x2)
    out, mutated = fmod.apply(variables, x1, x2, True,
                              mutable=["batch_stats"])
    assert out.shape == (B, H, W, dim)
    old = variables["batch_stats"]["channel_emb"]["norm"]["mean"]
    new = mutated["batch_stats"]["channel_emb"]["norm"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))
