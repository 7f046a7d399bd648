"""Data pipeline tests: cv_ops semantics, dataset loading, augmentation, loader."""
import numpy as np
import pytest

from rgbx_semantic_segmentation_tpu.data import cv_ops
from rgbx_semantic_segmentation_tpu.data.dataset import RGBXDataset
from rgbx_semantic_segmentation_tpu.data.preprocess import TrainPre, ValPre
from rgbx_semantic_segmentation_tpu.data.synthetic import make_synthetic_dataset


# ---------------------------------------------------------------- cv_ops ----

def test_resize_linear_identity():
    img = np.random.RandomState(0).randint(0, 255, (10, 12, 3), np.uint8)
    out = cv_ops.resize_linear(img, (10, 12))
    np.testing.assert_array_equal(out, img)


def test_resize_linear_upscale_2x_midpoints():
    # 2x upsample with half-pixel centers: dst 0 maps to src -0.25 (clamped),
    # dst 1 maps to src 0.25 -> interpolation between 0 and 1.
    img = np.array([[0.0, 100.0]], np.float32)
    out = cv_ops.resize_linear(img, (1, 4))
    np.testing.assert_allclose(out, [[0.0, 25.0, 75.0, 100.0]], atol=1e-5)


def test_resize_linear_matches_torch_interpolate():
    # torch F.interpolate(align_corners=False) shares cv2's half-pixel mapping.
    import torch
    rng = np.random.RandomState(1)
    img = rng.rand(17, 23, 3).astype(np.float32)
    out = cv_ops.resize_linear(img, (9, 31))
    t = torch.nn.functional.interpolate(
        torch.from_numpy(img.transpose(2, 0, 1)[None]), size=(9, 31),
        mode="bilinear", align_corners=False)[0].numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(out, t, atol=1e-5)


def test_resize_nearest_truncation():
    img = np.arange(4).reshape(2, 2).astype(np.uint8)
    out = cv_ops.resize_nearest(img, (4, 4))
    # cv2 INTER_NEAREST: src = floor(dst * 0.5)
    expected = np.array([[0, 0, 1, 1], [0, 0, 1, 1],
                         [2, 2, 3, 3], [2, 2, 3, 3]], np.uint8)
    np.testing.assert_array_equal(out, expected)


def test_hsv_roundtrip():
    rng = np.random.RandomState(2)
    bgr = rng.randint(0, 255, (16, 16, 3), np.uint8)
    hsv = cv_ops.bgr_to_hsv_u8(bgr)
    assert hsv[..., 0].max() < 180.5
    back = cv_ops.hsv_to_bgr_u8(np.clip(np.rint(hsv), 0, 255).astype(np.uint8))
    # uint8 HSV quantisation costs a few LSBs
    assert np.abs(back.astype(int) - bgr.astype(int)).mean() < 4


def test_gaussian_blur_preserves_mean():
    rng = np.random.RandomState(3)
    img = rng.rand(32, 32, 3).astype(np.float32)
    out = cv_ops.gaussian_blur(img)
    assert out.shape == img.shape
    assert abs(float(out.mean()) - float(img.mean())) < 1e-3
    assert float(out.var()) < float(img.var())  # smoothing reduces variance


def test_pad_to_shape_margins():
    img = np.ones((3, 4), np.float32)
    out, margin = cv_ops.pad_to_shape(img, (8, 9), value=0)
    assert out.shape == (8, 9)
    np.testing.assert_array_equal(margin, [2, 3, 2, 3])
    assert out[2:5, 2:6].sum() == 12


def test_normalize():
    img = np.full((2, 2, 3), 255, np.uint8)
    out = cv_ops.normalize(img, (0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
    np.testing.assert_allclose(out, 2.0, atol=1e-6)


# --------------------------------------------------------------- dataset ----

@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    ds_cfg = make_synthetic_dataset(str(root), num_train=6, num_val=3,
                                    hw=(40, 48), num_classes=4)
    return ds_cfg


def test_dataset_loads_triples(synth):
    ds = RGBXDataset(synth, "train")
    assert len(ds) == 6
    item = ds[0]
    assert item["rgb"].shape == (40, 48, 3)
    assert item["modal_x"].shape == (40, 48, 3)
    assert item["label"].shape == (40, 48)
    # single-channel modal replicated
    np.testing.assert_array_equal(item["modal_x"][..., 0],
                                  item["modal_x"][..., 1])


def test_dataset_oversampling(synth):
    ds = RGBXDataset(synth, "train", file_length=20)
    ds.set_epoch(0)
    assert len(ds) == 20
    names0 = list(ds._names())
    ds.set_epoch(1)
    names1 = list(ds._names())
    assert names0[:18] == names1[:18]  # repeated full passes identical
    assert len(names0) == 20


def test_train_pre_output(synth):
    ds = RGBXDataset(synth, "train")
    raw = ds[0]
    pre = TrainPre(norm_mean=(0.485, 0.456, 0.406), norm_std=(0.229, 0.224, 0.225),
                   image_hw=(40, 48), num_classes=4, background=255,
                   train_scale_array=(0.75, 1.0, 1.25),
                   rng=np.random.RandomState(0))
    rgb, gt, mx = pre(raw["rgb"], raw["label"], raw["modal_x"])
    assert rgb.shape == (40, 48, 3) and rgb.dtype == np.float32
    assert gt.shape == (40, 48) and gt.dtype == np.int32
    assert mx.shape == (40, 48, 3)
    valid = gt[gt != 255]
    assert valid.min() >= 0 and valid.max() < 4


def test_val_pre_deterministic(synth):
    ds = RGBXDataset(synth, "val")
    raw = ds[0]
    pre = ValPre((0.485, 0.456, 0.406), (0.229, 0.224, 0.225), (40, 48))
    a = pre(raw["rgb"], raw["label"], raw["modal_x"])
    b = pre(raw["rgb"], raw["label"], raw["modal_x"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_train_loader_batches(synth):
    from rgbx_semantic_segmentation_tpu.config import (
        mfnet_config, TrainConfig)
    cfg = mfnet_config().replace(
        dataset=synth,
        train=TrainConfig(batch_size=4, niters_per_epoch=3, num_workers=2))
    from rgbx_semantic_segmentation_tpu.data.loader import TrainLoader
    loader = TrainLoader(cfg, num_workers=2)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    b = batches[0]
    assert b["rgb"].shape == (4, 40, 48, 3)
    assert b["label"].shape == (4, 40, 48)
    # epoch determinism: same epoch -> same batches
    batches2 = list(loader.epoch(0))
    np.testing.assert_array_equal(batches[0]["label"], batches2[0]["label"])
