"""Pretrained-checkpoint loading for the ResNet and SegNeXt families
(reference dual_resnet.load_dualpath_model, dual_resnet.py:102-138, and the
segnext analogue): single-tower torch .pth -> both towers, classifier head
dropped, loaded model still runs.

torchvision isn't installed in this image, so the single-tower state dicts are
synthesized by REVERSING this framework's flax layout into the torch key space
(torchvision keys for resnet; the working stem/stages/downsample/norm naming
for segnext) — which exercises exactly the converter path a real checkpoint
takes: duplicate -> torch_to_flax layout transform -> scoped strict=False merge.
"""
import numpy as np
import pytest
import torch
import jax

from rgbx_semantic_segmentation_tpu import convert


def _torch_name(path_elem: str) -> str:
    """Reverse torch_key_to_path's index fusion: 'layer1_0' -> 'layer1.0',
    'stages_0_1' -> 'stages.0.1' (only trailing _<digits> groups split)."""
    parts = path_elem.split("_")
    out = [parts[0]]
    for p in parts[1:]:
        if p.isdigit():
            out.append(p)
        else:
            out[-1] = out[-1] + "_" + p
    return ".".join(out)


def _flax_to_torch_sd(params, batch_stats, scale=1.0):
    """Single-tower flax trees -> flat torch-style state dict (numpy values),
    inverting convert._convert_leaf's layout rules."""
    sd = {}

    def walk_params(node, prefix):
        for k, v in node.items():
            name = _torch_name(k)
            if isinstance(v, dict):
                walk_params(v, prefix + (name,))
                continue
            arr = np.asarray(v) * scale
            if k == "kernel":
                if arr.ndim == 4:            # HWIO -> OIHW
                    sd[".".join(prefix + ("weight",))] = arr.transpose(3, 2, 0, 1)
                else:                        # (in, out) -> (out, in)
                    sd[".".join(prefix + ("weight",))] = arr.T
            elif k == "scale":
                sd[".".join(prefix + ("weight",))] = arr
            elif k == "bias":
                sd[".".join(prefix + ("bias",))] = arr
            else:
                sd[".".join(prefix + (name,))] = arr

    def walk_stats(node, prefix):
        for k, v in node.items():
            name = _torch_name(k)
            if isinstance(v, dict):
                walk_stats(v, prefix + (name,))
            elif k == "mean":
                sd[".".join(prefix + ("running_mean",))] = np.asarray(v) * scale
            elif k == "var":
                # keep variance positive under scaling
                sd[".".join(prefix + ("running_var",))] = np.asarray(v) * abs(scale)

    walk_params(params, ())
    walk_stats(batch_stats, ())
    return sd


def _leaf_max_delta(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


@pytest.fixture(scope="module")
def resnet_fixture():
    """Small dual ResNet (bottleneck layout, torchvision key space)."""
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_resnet import (
        DualResNet)

    model = DualResNet(layers=(1, 1, 1, 1))
    rgb = np.zeros((1, 64, 64, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), rgb, rgb)
    return model, variables, rgb


def test_resnet_pretrained_load(resnet_fixture, tmp_path):
    model, variables, rgb = resnet_fixture
    # scale=2 so loaded values are distinguishable from init
    sd = _flax_to_torch_sd(variables["params"]["backbone"],
                           variables["batch_stats"]["backbone"], scale=2.0)
    assert "conv1.weight" in sd and "layer1.0.downsample.0.weight" in sd
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)  # must be dropped
    sd["fc.bias"] = np.zeros((1000,), np.float32)
    path = tmp_path / "resnet.pth"
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, str(path))

    scoped = {"params": {"backbone": variables["params"]},
              "batch_stats": {"backbone": variables["batch_stats"]}}
    loaded = convert.load_dualpath_pretrained(str(path), scoped,
                                              family="resnet")
    p = loaded["params"]["backbone"]
    # both towers carry the (scaled) checkpoint weights of the SINGLE source
    src = variables["params"]["backbone"]
    for tower in ("backbone", "backbone_d"):
        np.testing.assert_allclose(
            np.asarray(p[tower]["conv1"]["kernel"]),
            2.0 * np.asarray(src["conv1"]["kernel"]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(p[tower]["layer1_0"]["downsample_0"]["kernel"]),
            2.0 * np.asarray(src["layer1_0"]["downsample_0"]["kernel"]),
            atol=1e-6)
    # fusion modules stay at init (strict=False)
    assert _leaf_max_delta(
        p["frm1"]["channel_weights"]["mlp_0"]["kernel"],
        variables["params"]["frm1"]["channel_weights"]["mlp_0"][
            "kernel"]) == 0.0
    # running stats came through
    np.testing.assert_allclose(
        np.asarray(loaded["batch_stats"]["backbone"]["backbone_d"]["bn1"][
            "mean"]),
        2.0 * np.asarray(variables["batch_stats"]["backbone"]["bn1"]["mean"]),
        atol=1e-6)
    # the loaded model still runs
    outs = model.apply({"params": p,
                        "batch_stats": loaded["batch_stats"]["backbone"]},
                       rgb, rgb)
    assert len(outs) == 4


def test_resnet_duplicator_drops_fc():
    sd = {"fc.weight": np.zeros((10, 4)), "conv1.weight": np.zeros((4, 3, 7, 7)),
          "backbone.fc.bias": np.zeros((10,))}
    dup = convert.duplicate_dual_path_resnet(sd)
    assert not any("fc" in k for k in dup)
    assert "backbone.conv1.weight" in dup and "backbone_d.conv1.weight" in dup


@pytest.fixture(scope="module")
def segnext_fixture():
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_segnext import (
        SegNextEncoder)

    model = SegNextEncoder(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128))
    rgb = np.zeros((1, 64, 64, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), rgb, rgb)
    return model, variables, rgb


def test_segnext_pretrained_load(segnext_fixture, tmp_path):
    model, variables, rgb = segnext_fixture
    # single tower = everything except the extra_ tower and fusion modules
    single_p = {k: v for k, v in variables["params"].items()
                if not k.startswith(("extra_", "FRMs", "FFMs"))}
    single_s = {k: v for k, v in variables["batch_stats"].items()
                if not k.startswith(("extra_", "FRMs", "FFMs"))}
    sd = _flax_to_torch_sd(single_p, single_s, scale=2.0)
    assert any(k.startswith("stem.") for k in sd)
    assert any(k.startswith("stages.") for k in sd)
    sd["head.weight"] = np.zeros((1000, 128), np.float32)  # ignored by merge
    path = tmp_path / "segnext.pth"
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, str(path))

    scoped = {"params": {"backbone": variables["params"]},
              "batch_stats": {"backbone": variables["batch_stats"]}}
    loaded = convert.load_dualpath_pretrained(str(path), scoped,
                                              family="segnext")
    p = loaded["params"]["backbone"]
    want = 2.0 * np.asarray(variables["params"]["stem_0"]["kernel"])
    np.testing.assert_allclose(np.asarray(p["stem_0"]["kernel"]), want,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(p["extra_stem_0"]["kernel"]), want,
                               atol=1e-6)
    wq = 2.0 * np.asarray(
        variables["params"]["stages_0_0"]["attn"]["conv55"]["kernel"])
    np.testing.assert_allclose(
        np.asarray(p["extra_stages_0_0"]["attn"]["conv55"]["kernel"]), wq,
        atol=1e-6)
    # fusion stays at init
    assert _leaf_max_delta(
        p["FRMs_0"]["channel_weights"]["mlp_0"]["kernel"],
        variables["params"]["FRMs_0"]["channel_weights"]["mlp_0"][
            "kernel"]) == 0.0
    outs = model.apply({"params": p,
                        "batch_stats": loaded["batch_stats"]["backbone"]},
                       rgb, rgb)
    assert len(outs) == 4


def test_family_for_backbone():
    """train_cli's --pretrained family dispatch (train_cli.py)."""
    assert convert.family_for_backbone("mit_b2") == "mit"
    assert convert.family_for_backbone("mit_b2_w_aspp") == "mit"
    assert convert.family_for_backbone("swin_s") == "swin"
    assert convert.family_for_backbone("resnet101") == "resnet"
    assert convert.family_for_backbone("segnext_small") == "segnext"
