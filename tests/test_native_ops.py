"""Native C++ cv ops: bit-compatibility with the numpy reference paths."""
import numpy as np
import pytest

from rgbx_semantic_segmentation_tpu import native
from rgbx_semantic_segmentation_tpu.data import cv_ops


@pytest.fixture(scope="module")
def nat():
    lib = native.ensure_built()
    if lib is None:
        pytest.skip("g++ unavailable; native lib not built")
    return lib


def _numpy_only(fn, *args, **kw):
    """Run a cv_ops function with native dispatch disabled."""
    import rgbx_semantic_segmentation_tpu.native as nat_mod

    saved = nat_mod._lib, nat_mod._tried
    nat_mod._lib, nat_mod._tried = None, True
    try:
        return fn(*args, **kw)
    finally:
        nat_mod._lib, nat_mod._tried = saved


def test_resize_linear_u8_matches_numpy(nat):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (37, 53, 3), np.uint8)
    got = cv_ops.resize_linear(img, (20, 31))
    ref = _numpy_only(cv_ops.resize_linear, img, (20, 31))
    # rounding of exact .5 values may differ by 1 LSB between paths
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_resize_linear_f32_matches_numpy(nat):
    rng = np.random.RandomState(1)
    img = rng.rand(37, 53, 3).astype(np.float32)
    got = cv_ops.resize_linear(img, (74, 106))
    ref = _numpy_only(cv_ops.resize_linear, img, (74, 106))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_resize_linear_grayscale(nat):
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (30, 40), np.uint8)
    got = cv_ops.resize_linear(img, (15, 20))
    ref = _numpy_only(cv_ops.resize_linear, img, (15, 20))
    assert got.shape == (15, 20)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_resize_nearest_matches_numpy(nat):
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (30, 40, 3), np.uint8)
    got = cv_ops.resize_nearest(img, (45, 61))
    ref = _numpy_only(cv_ops.resize_nearest, img, (45, 61))
    np.testing.assert_array_equal(got, ref)


def test_normalize_matches_numpy(nat):
    rng = np.random.RandomState(4)
    img = rng.randint(0, 255, (30, 40, 3), np.uint8)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    got = cv_ops.normalize(img, mean, std)
    ref = _numpy_only(cv_ops.normalize, img, mean, std)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_gaussian_blur_matches_numpy(nat):
    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (32, 48, 3), np.uint8)
    got = cv_ops.gaussian_blur(img, (5, 5), 1.0)
    ref = _numpy_only(cv_ops.gaussian_blur, img, (5, 5), 1.0)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_native_speedup(nat):
    """The native path should beat numpy on a realistic 480x640 resize."""
    import time

    rng = np.random.RandomState(6)
    img = rng.randint(0, 255, (960, 1280, 3), np.uint8)

    t0 = time.perf_counter()
    for _ in range(5):
        cv_ops.resize_linear(img, (480, 640))
    native_t = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(5):
        _numpy_only(cv_ops.resize_linear, img, (480, 640))
    numpy_t = time.perf_counter() - t0
    # informational bound: native should not be slower
    assert native_t < numpy_t * 1.5, (native_t, numpy_t)


def test_hsv_jitter_matches_numpy(nat):
    rng = np.random.RandomState(7)
    bgr = rng.randint(0, 255, (48, 64, 3), np.uint8)
    got = cv_ops.hsv_jitter(bgr, 1.1, 0.9, 10.0)
    ref = _numpy_only(cv_ops.hsv_jitter, bgr, 1.1, 0.9, 10.0)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
