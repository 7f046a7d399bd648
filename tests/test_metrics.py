"""Golden tests: metrics vs the reference numpy implementation."""
import numpy as np
import pytest

from tests.conftest import reference_path
from rgbx_semantic_segmentation_tpu import metrics


@pytest.fixture(scope="module")
def ref_metric():
    reference_path()
    from utils import metric as ref
    return ref


def _random_case(seed, n_cl=9, with_ignore=True):
    rng = np.random.RandomState(seed)
    pred = rng.randint(0, n_cl, size=(37, 53))
    gt = rng.randint(0, n_cl, size=(37, 53))
    if with_ignore:
        gt[rng.rand(*gt.shape) < 0.1] = 255
    return pred, gt


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_hist_info_matches_reference(ref_metric, seed):
    pred, gt = _random_case(seed)
    h_ref, l_ref, c_ref = ref_metric.hist_info(9, pred, gt)
    h, l, c = metrics.hist_info(9, pred, gt)
    np.testing.assert_array_equal(h, h_ref)
    assert l == l_ref and c == c_ref


@pytest.mark.parametrize("seed", [0, 3])
def test_hist_info_jax_matches_numpy(seed):
    pred, gt = _random_case(seed, n_cl=5)
    h, l, c = metrics.hist_info(5, pred, gt)
    hj, lj, cj = metrics.hist_info_jax(5, pred, gt)
    np.testing.assert_array_equal(np.asarray(hj), h)
    assert int(lj) == l and int(cj) == c


def test_compute_score_matches_reference(ref_metric):
    pred, gt = _random_case(7)
    hist, labeled, correct = metrics.hist_info(9, pred, gt)
    ref = ref_metric.compute_score(hist, correct, labeled)
    got = metrics.compute_score(hist, correct, labeled)
    np.testing.assert_allclose(got.iou, ref[0], rtol=1e-12)
    assert got.mean_iou == pytest.approx(ref[1])
    assert got.mean_iou_no_back == pytest.approx(ref[2])
    assert got.freq_iou == pytest.approx(ref[3])
    assert got.mean_pixel_acc == pytest.approx(ref[4])
    assert got.pixel_acc == pytest.approx(ref[5])


def test_compute_score_with_missing_class():
    # A class absent from both pred and gt must yield nan IoU, excluded by nanmean.
    pred = np.zeros((10, 10), int)
    gt = np.zeros((10, 10), int)
    gt[0, :5] = 1
    hist, labeled, correct = metrics.hist_info(4, pred, gt)
    s = metrics.compute_score(hist, correct, labeled)
    assert np.isnan(s.iou[2]) and np.isnan(s.iou[3])
    assert 0.0 <= s.mean_iou <= 1.0


def test_print_iou_format():
    hist = np.eye(3, dtype=np.int64) * 10
    s = metrics.compute_score(hist, 30, 30)
    out = metrics.print_iou(s, class_names=["a", "b", "c"], show_no_back=True)
    assert "mean_IoU: 100.000%" in out
    assert "1 a" in out
