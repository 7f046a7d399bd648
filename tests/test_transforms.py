"""Tests for the geometric transform library (reference utils/transforms.py)."""
import numpy as np
import pytest

from rgbx_semantic_segmentation_tpu.data import transforms as T


def test_get_2dshape():
    assert T.get_2dshape(5) == (5, 5)
    assert T.get_2dshape((3, 4)) == (3, 4)
    with pytest.raises(AssertionError):
        T.get_2dshape((0, 4), zero=False)


def test_random_crop_pad_to_shape():
    img = np.arange(100, dtype=np.float32).reshape(10, 10)
    out, margin = T.random_crop_pad_to_shape(img, (2, 3), (4, 4), 0)
    assert out.shape == (4, 4)
    np.testing.assert_array_equal(out[0, :4], img[2, 3:7])
    assert margin.sum() == 0


def test_random_crop_pad_when_small():
    img = np.ones((3, 3), np.float32)
    out, margin = T.random_crop_pad_to_shape(img, (0, 0), (5, 5), 7)
    assert out.shape == (5, 5)
    assert out[0, 0] == 7  # padded corner
    assert margin.sum() > 0


def test_generate_random_crop_pos_bounds():
    rng = np.random.RandomState(0)
    for _ in range(20):
        y, x = T.generate_random_crop_pos((10, 12), (4, 5), rng)
        assert 0 <= y <= 6 and 0 <= x <= 7


def test_pad_to_multiples():
    img = np.zeros((30, 33), np.uint8)
    out, margin = T.pad_image_size_to_multiples_of(img, 32, 0)
    assert out.shape == (32, 64)


def test_resize_ensure_shortest_edge():
    img = np.zeros((40, 80, 3), np.uint8)
    out = T.resize_ensure_shortest_edge(img, 20)
    assert out.shape == (20, 40, 3)
    out = T.resize_ensure_shortest_edge(np.zeros((80, 40, 3), np.uint8), 20)
    assert out.shape == (40, 20, 3)


def test_random_scale_pair():
    rng = np.random.RandomState(1)
    img = np.zeros((20, 30, 3), np.uint8)
    gt = np.zeros((20, 30), np.uint8)
    img2, gt2, scale = T.random_scale(img, gt, [0.5], rng)
    assert img2.shape == (10, 15, 3) and gt2.shape == (10, 15)
    assert scale == 0.5


def test_random_rotation_shapes_and_classes():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (24, 24, 3), np.uint8)
    gt = rng.randint(0, 4, (24, 24), np.uint8)
    img2, gt2 = T.random_rotation(img, gt, rng)
    assert img2.shape == img.shape and gt2.shape == gt.shape
    # nearest rotation must not invent class ids
    assert set(np.unique(gt2)).issubset(set(np.unique(gt)) | {0})


def test_center_and_random_crop():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    c = T.center_crop(img, (4, 4))
    np.testing.assert_array_equal(c, img[2:6, 2:6])
    rng = np.random.RandomState(3)
    img3 = np.zeros((10, 10, 3), np.uint8)
    gt3 = np.zeros((10, 10), np.uint8)
    i2, g2 = T.random_crop(img3, gt3, 6, rng)
    assert i2.shape == (6, 6, 3) and g2.shape == (6, 6)
