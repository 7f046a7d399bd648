"""Batched whole-image eval path must produce identical results to the
per-image sliding path."""
import numpy as np
import pytest
import jax

from rgbx_semantic_segmentation_tpu.config import (
    DatasetConfig, EvalConfig, ModelConfig, TrainConfig, mfnet_config)
from rgbx_semantic_segmentation_tpu import train as train_lib
from rgbx_semantic_segmentation_tpu.data.loader import ValLoader
from rgbx_semantic_segmentation_tpu.data.synthetic import make_synthetic_dataset
from rgbx_semantic_segmentation_tpu.evaluator import SegEvaluator


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalb")
    ds = make_synthetic_dataset(str(root), num_train=2, num_val=5,
                                hw=(32, 40), num_classes=4, seed=3)
    cfg = mfnet_config().replace(
        dataset=ds,
        model=ModelConfig(backbone="mit_b0", decoder="MLPDecoder",
                          decoder_embed_dim=64, use_mixed_precision=False),
        eval=EvalConfig(eval_scale_array=(1.0,), eval_flip=False,
                        eval_crop_size=(32, 40)),
    )
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return cfg, state, variables


def test_batched_matches_per_image(setup):
    cfg, state, variables = setup
    val = ValLoader(cfg)
    ev = SegEvaluator(cfg, state.apply_fn)
    s1, _ = ev.evaluate(variables, val.dataset, eval_batch=1)
    s2, _ = ev.evaluate(variables, val.dataset, eval_batch=4)
    assert s1.mean_iou == pytest.approx(s2.mean_iou, abs=1e-6)
    assert s1.pixel_acc == pytest.approx(s2.pixel_acc, abs=1e-6)
    np.testing.assert_allclose(s1.iou, s2.iou, atol=1e-6, equal_nan=True)


def test_batched_multiscale_flip(setup):
    cfg, state, variables = setup
    cfg2 = cfg.replace(eval=EvalConfig(eval_scale_array=(0.75, 1.0),
                                       eval_flip=True,
                                       eval_crop_size=(32, 40)))
    val = ValLoader(cfg2)
    ev = SegEvaluator(cfg2, state.apply_fn)
    s1, _ = ev.evaluate(variables, val.dataset, eval_batch=1)
    s2, _ = ev.evaluate(variables, val.dataset, eval_batch=3)
    assert s1.mean_iou == pytest.approx(s2.mean_iou, abs=1e-6)


def test_mesh_sharded_eval_matches(setup):
    """Eval sharded over the 8-device mesh == single-device eval."""
    from rgbx_semantic_segmentation_tpu.parallel.mesh import make_mesh

    cfg, state, variables = setup
    val = ValLoader(cfg)
    ev1 = SegEvaluator(cfg, state.apply_fn)
    s1, _ = ev1.evaluate(variables, val.dataset, eval_batch=4)
    ev8 = SegEvaluator(cfg, state.apply_fn, mesh=make_mesh())
    # 5 val images -> one full group of 4 (sharded when divisible) + remainder
    s8, _ = ev8.evaluate(variables, val.dataset, eval_batch=4)
    assert s1.mean_iou == pytest.approx(s8.mean_iou, abs=1e-6)


def test_mesh_sharded_sliding_grid_matches(setup):
    """The SLIDING grid (image > crop in both dims) sharded over the 8-device
    mesh == unsharded — exercises the `self._shard(...)` call on the stacked
    window batch (evaluator._batched_windows_forward), which whole-image
    eval tests never reach. Geometry picked so the window count divides the
    data axis: crop (16,24), stride 2/3 -> strides (11,16); image (44,40) ->
    grid 4x2 = 8 windows."""
    from rgbx_semantic_segmentation_tpu.evaluator import _window_grid
    from rgbx_semantic_segmentation_tpu.parallel.mesh import make_mesh

    cfg, state, variables = setup
    cfg_slide = cfg.replace(eval=EvalConfig(eval_scale_array=(1.0,),
                                            eval_flip=False,
                                            eval_crop_size=(16, 24)))
    assert len(_window_grid(44, 40, (16, 24), 2.0 / 3.0)) == 8
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(44, 40, 3)).astype(np.uint8)
    mx = rng.randint(0, 256, size=(44, 40, 3)).astype(np.uint8)
    ev1 = SegEvaluator(cfg_slide, state.apply_fn)
    ev8 = SegEvaluator(cfg_slide, state.apply_fn, mesh=make_mesh())
    np.testing.assert_array_equal(ev1.sliding_eval_rgbx(variables, img, mx),
                                  ev8.sliding_eval_rgbx(variables, img, mx))
    # Same for the compat stride-swap grid (4x2 rects at this geometry) —
    # its window batch goes through the same _shard call (evaluator.py
    # _windows_forward_stride_swap).
    ev1s = SegEvaluator(cfg_slide, state.apply_fn, compat_stride_swap=True)
    ev8s = SegEvaluator(cfg_slide, state.apply_fn, compat_stride_swap=True,
                        mesh=make_mesh())
    np.testing.assert_array_equal(ev1s.sliding_eval_rgbx(variables, img, mx),
                                  ev8s.sliding_eval_rgbx(variables, img, mx))


def test_verbose_logs_running_metric(setup):
    """eval -v parity (reference eval.py:89, evaluator.py:138-143): a running
    metric line per image, without changing the final scores."""
    import logging

    cfg, state, variables = setup
    val = ValLoader(cfg)
    ev = SegEvaluator(cfg, state.apply_fn)
    logger = logging.getLogger("test_verbose_eval")
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logger.addHandler(Capture())
    logger.setLevel(logging.INFO)
    s_quiet, _ = ev.evaluate(variables, val.dataset)
    s_verb, _ = ev.evaluate(variables, val.dataset, logger=logger,
                            verbose=True)
    assert s_quiet.mean_iou == pytest.approx(s_verb.mean_iou, abs=1e-6)
    running = [m for m in records if "running mIoU" in m]
    assert len(running) == len(val.dataset)


def test_eval_on_2d_mesh_matches(setup):
    """Batched eval sharded over a 2-D (data x spatial) mesh == unsharded
    (the 32-row images divide the 4-way spatial axis)."""
    from rgbx_semantic_segmentation_tpu.parallel.mesh import make_mesh_2d

    cfg, state, variables = setup
    val = ValLoader(cfg)
    ev1 = SegEvaluator(cfg, state.apply_fn)
    s1, _ = ev1.evaluate(variables, val.dataset, eval_batch=4)
    ev2 = SegEvaluator(cfg, state.apply_fn, mesh=make_mesh_2d(2, 4))
    s2, _ = ev2.evaluate(variables, val.dataset, eval_batch=4)
    assert s1.mean_iou == pytest.approx(s2.mean_iou, abs=1e-6)
