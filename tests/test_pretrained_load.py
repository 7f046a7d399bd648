"""End-to-end pretrained checkpoint loading: single-tower SegFormer .pth ->
dual-tower flax params (reference load_dualpath_model semantics)."""
import numpy as np
import pytest
import torch
import jax

from tests.conftest import reference_path
from rgbx_semantic_segmentation_tpu import convert
from rgbx_semantic_segmentation_tpu.models.encoders.dual_segformer import mit_b0


@pytest.fixture(scope="module")
def single_tower_pth(tmp_path_factory):
    """Build a single-tower checkpoint by stripping the dual/extra keys from a
    reference mit_b0 state_dict — the exact key space of the official
    SegFormer releases (plus a classifier head entry that must be ignored)."""
    reference_path()
    from models.encoders.dual_segformer import mit_b0 as ref_factory

    model = ref_factory()
    sd = {k: v for k, v in model.state_dict().items()
          if not k.startswith(("extra_", "FRMs", "FFMs"))}
    sd["head.weight"] = torch.zeros(1000, 256)  # strict=False must skip this
    sd["head.bias"] = torch.zeros(1000)
    path = tmp_path_factory.mktemp("ckpt") / "mit_b0.pth"
    torch.save(sd, str(path))
    return str(path), sd


def test_load_dualpath_pretrained(single_tower_pth):
    path, sd = single_tower_pth
    model = mit_b0()
    rgb = np.zeros((1, 64, 64, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), rgb, rgb)
    init_frm = np.asarray(
        variables["params"]["FRMs_0"]["channel_weights"]["mlp_0"]["kernel"])

    scoped = {"params": {"backbone": variables["params"]},
              "batch_stats": {"backbone": variables["batch_stats"]}}
    loaded = convert.load_dualpath_pretrained(path, scoped)
    params = loaded["params"]["backbone"]

    # both towers carry the checkpoint weights
    w = sd["patch_embed1.proj.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(params["patch_embed1"]["proj"]["kernel"]), w, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["extra_patch_embed1"]["proj"]["kernel"]), w,
        atol=1e-6)
    q = sd["block1.0.attn.q.weight"].numpy().T
    np.testing.assert_allclose(
        np.asarray(params["extra_block1_0"]["attn"]["q"]["kernel"]), q,
        atol=1e-6)
    # FRM/FFM remain at init (strict=False semantics)
    np.testing.assert_array_equal(
        np.asarray(params["FRMs_0"]["channel_weights"]["mlp_0"]["kernel"]),
        init_frm)

    # the loaded model still runs
    out = model.apply({"params": params,
                       "batch_stats": loaded["batch_stats"]["backbone"]},
                      rgb, rgb)
    assert len(out) == 4
