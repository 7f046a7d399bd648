"""Golden tests: LR schedules vs reference utils/lr_policy.py classes."""
import numpy as np
import pytest

from tests.conftest import reference_path
from rgbx_semantic_segmentation_tpu import lr_schedules
from rgbx_semantic_segmentation_tpu.config import mfnet_config


@pytest.fixture(scope="module")
def ref_lr():
    reference_path()
    from utils import lr_policy
    return lr_policy


def test_warmup_poly_matches_reference(ref_lr):
    total, warm = 29600, 1480
    ref = ref_lr.WarmUpPolyLR(6e-5, 0.9, total, warm)
    sched = lr_schedules.warmup_poly_lr(6e-5, 0.9, total, warm)
    for it in [0, 1, 500, 1479, 1480, 1481, 10000, 29599]:
        # schedules run in fp32 on device; the reference computes in float64
        assert float(sched(it)) == pytest.approx(ref.get_lr(it), rel=1e-3)


def test_poly_matches_reference(ref_lr):
    ref = ref_lr.PolyLR(1e-2, 0.9, 1000)
    sched = lr_schedules.poly_lr(1e-2, 0.9, 1000)
    for it in [0, 10, 500, 999]:
        assert float(sched(it)) == pytest.approx(ref.get_lr(it), rel=1e-3)


def test_multi_stage_matches_reference(ref_lr):
    stages = [(10, 1e-2), (20, 1e-3), (100, 1e-4)]
    ref = ref_lr.MultiStageLR(stages)
    sched = lr_schedules.multi_stage_lr(stages)
    for ep in [0, 5, 9, 10, 15, 25, 99]:
        assert float(sched(ep)) == pytest.approx(ref.get_lr(ep), rel=1e-6)


def test_linear_increase_matches_reference(ref_lr):
    ref = ref_lr.LinearIncreaseLR(1e-4, 1e-2, 100)
    sched = lr_schedules.linear_increase_lr(1e-4, 1e-2, 100)
    for ep in [0, 1, 50, 99, 100]:
        assert float(sched(ep)) == pytest.approx(ref.get_lr(ep), rel=1e-6)


def test_cyclic_matches_reference(ref_lr):
    kw = dict(min_lr=1e-5, max_lr=1e-3, cycle_epochs=10, warmup_epochs=5,
              total_iters=10000, iters_per_epoch=100)
    ref = ref_lr.CyclicLR(**kw)
    lr_s, mom_s = lr_schedules.cyclic_lr(**kw)
    for it in [0, 100, 499]:  # warmup region returns lr only
        assert float(lr_s(it)) == pytest.approx(ref.get_lr(it), rel=1e-6)
    for it in [500, 760, 1500, 2550, 9999]:  # post-warmup returns (lr, momentum)
        lr_ref, mom_ref = ref.get_lr(it)
        assert float(lr_s(it)) == pytest.approx(lr_ref, rel=1e-6)
        assert float(mom_s(it)) == pytest.approx(mom_ref, rel=1e-6)


def test_step_lr_matches_reference(ref_lr):
    ref = ref_lr.StepLR(1e-2, 30, 0.1)
    sched = lr_schedules.step_lr(1e-2, 30, 0.1)
    for ep in [0, 29, 30, 59, 60, 90]:
        assert float(sched(ep)) == pytest.approx(ref.get_lr(ep), rel=1e-6)


def test_build_schedule_from_config():
    cfg = mfnet_config()
    sched = lr_schedules.build_schedule("WarmUpPolyLR", cfg.train)
    assert float(sched(0)) == 0.0
    assert float(sched(cfg.train.warmup_iters)) == pytest.approx(
        cfg.train.lr * (1 - cfg.train.warmup_iters / cfg.train.total_iters) ** 0.9,
        rel=1e-6)
