"""End-to-end smoke: synthetic dataset -> train -> eval -> checkpoint -> resume.

Covers the reference's implicit test strategy (SURVEY.md §4): the metric-eval
oracle plus save/restore round-trips, all hermetic on the CPU mesh.
"""
import os

import numpy as np
import pytest
import jax

from rgbx_semantic_segmentation_tpu.config import (
    DatasetConfig, ModelConfig, TrainConfig, EvalConfig, mfnet_config)
from rgbx_semantic_segmentation_tpu import train as train_lib
from rgbx_semantic_segmentation_tpu.checkpoint import CheckpointManager
from rgbx_semantic_segmentation_tpu.data.loader import TrainLoader, ValLoader
from rgbx_semantic_segmentation_tpu.data.synthetic import make_synthetic_dataset
from rgbx_semantic_segmentation_tpu.evaluator import (
    SegEvaluator, parse_epoch_spec)


@pytest.fixture(scope="module")
def e2e_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_data")
    ds = make_synthetic_dataset(str(root), num_train=8, num_val=3,
                                hw=(32, 32), num_classes=4, seed=1)
    cfg = mfnet_config().replace(
        dataset=ds,
        model=ModelConfig(backbone="mit_b0", decoder="MLPDecoder",
                          decoder_embed_dim=64, use_mixed_precision=False,
                          drop_path_rate=0.0),
        train=TrainConfig(batch_size=4, nepochs=4, niters_per_epoch=4,
                          warm_up_epoch=0, lr=1e-3, num_workers=0,
                          train_scale_array=None),
        eval=EvalConfig(eval_scale_array=(1.0,), eval_flip=False,
                        eval_crop_size=(32, 32)),
    )
    return cfg


def test_train_eval_checkpoint_resume(e2e_cfg, tmp_path):
    cfg = e2e_cfg
    loader = TrainLoader(cfg, num_workers=0)
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_train_step(cfg)

    losses = []
    for epoch in range(cfg.train.nepochs):
        for batch in loader.epoch(epoch):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], f"no learning: {losses}"

    # --- eval ---
    val = ValLoader(cfg)
    evaluator = SegEvaluator(cfg, state.apply_fn)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    scores, line = evaluator.evaluate(variables, val.dataset)
    assert "mean_IoU" in line
    # 16 steps on structured labels: well clear of chance (0.25); measured
    # 0.49 at this config. The real convergence bar (mIoU > 0.9) lives in
    # tests/test_convergence.py.
    assert scores.pixel_acc > 0.42

    # --- checkpoint -> restore round-trip ---
    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(2, state)
    assert mgr.latest_epoch() == 2
    fresh = train_lib.create_train_state(cfg, jax.random.PRNGKey(42))
    restored, next_epoch = mgr.restore(fresh)
    assert next_epoch == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored model reproduces identical eval scores
    variables_r = {"params": restored.params,
                   "batch_stats": restored.batch_stats}
    scores_r, _ = evaluator.evaluate(variables_r, val.dataset)
    assert scores_r.mean_iou == pytest.approx(scores.mean_iou, abs=1e-6)

    # resumed training continues from the same step counter
    assert int(restored.step) == int(state.step)
    mgr.close()


def test_async_checkpoint_overlapping_saves(e2e_cfg, tmp_path):
    """Saves are async (dispatch returns before the disk commit); listing and
    restore drain the in-flight write, and back-to-back dispatches serialize
    correctly — epoch 2's state restores even when dispatched while epoch 1's
    commit may still be in flight."""
    cfg = e2e_cfg
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(1))
    mgr = CheckpointManager(str(tmp_path / "ckpt_async"))
    mgr.save(1, state)
    state2 = state.replace(step=state.step + 5)
    mgr.save(2, state2)
    assert mgr.all_epochs() == [1, 2]
    fresh = train_lib.create_train_state(cfg, jax.random.PRNGKey(2))
    restored, next_epoch = mgr.restore(fresh, epoch=2)
    assert next_epoch == 3
    assert int(restored.step) == int(state.step) + 5
    mgr.close()


def test_sliding_window_covers_larger_image(e2e_cfg):
    """Image larger than the crop triggers the sliding grid path."""
    cfg = e2e_cfg
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    evaluator = SegEvaluator(cfg, state.apply_fn)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (50, 70, 3), np.uint8)
    mx = rng.randint(0, 255, (50, 70, 3), np.uint8)
    pred = evaluator.sliding_eval_rgbx(variables, img, mx)
    assert pred.shape == (50, 70)
    assert pred.min() >= 0 and pred.max() < cfg.dataset.num_classes


def test_multi_scale_and_flip(e2e_cfg):
    cfg = e2e_cfg.replace(eval=EvalConfig(
        eval_scale_array=(0.75, 1.0, 1.25), eval_flip=True,
        eval_crop_size=(32, 32)))
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    evaluator = SegEvaluator(cfg, state.apply_fn)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (32, 32, 3), np.uint8)
    mx = rng.randint(0, 255, (32, 32, 3), np.uint8)
    pred = evaluator.sliding_eval_rgbx(variables, img, mx)
    assert pred.shape == (32, 32)


def test_parse_epoch_spec():
    avail = [100, 150, 200, 250, 300]
    assert parse_epoch_spec("last", avail) == [300]
    assert parse_epoch_spec("200", avail) == [200]
    assert parse_epoch_spec("150-250", avail) == [150, 200, 250]
    assert parse_epoch_spec("200-", avail) == [200, 250, 300]
    assert parse_epoch_spec("999", avail) == []


def test_resolve_checkpoint_spec_forms(e2e_cfg, tmp_path):
    """resolve_checkpoint_spec handles every `-e` form the CLIs accept
    (reference evaluator.py:42-81): checkpoint dir, epoch-numbered step dir,
    spec-vs-default-dir, and loud failure on no match."""
    from rgbx_semantic_segmentation_tpu.checkpoint import resolve_checkpoint_spec

    cfg = e2e_cfg
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(3))
    ckpt_dir = str(tmp_path / "ckpt_spec")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(1, state)
    mgr.save(3, state, block=True)
    mgr.close()

    m, epochs = resolve_checkpoint_spec(ckpt_dir, "/nonexistent")
    assert epochs == [3]  # a checkpoint dir -> its latest epoch
    m.close()
    m, epochs = resolve_checkpoint_spec(os.path.join(ckpt_dir, "1"),
                                        "/nonexistent")
    assert epochs == [1]  # an epoch-numbered Orbax step dir
    m.close()
    m, epochs = resolve_checkpoint_spec("last", ckpt_dir)
    assert epochs == [3]
    m.close()
    m, epochs = resolve_checkpoint_spec("1-3", ckpt_dir)
    assert epochs == [1, 3]
    m.close()
    with pytest.raises(SystemExit):
        resolve_checkpoint_spec("7", ckpt_dir)


def test_eval_composite_color_convention(e2e_cfg, tmp_path):
    """-s composites: photo panel is RGB order and class-color panels agree
    with the palettised-PNG colors (regression: painting RGB triples into the
    pipeline's BGR photo rendered the photo channel-swapped)."""
    from PIL import Image

    from rgbx_semantic_segmentation_tpu.data.dataset import RGBXDataset

    cfg = e2e_cfg
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(5))
    val = ValLoader(cfg)
    evaluator = SegEvaluator(cfg, state.apply_fn)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    save = str(tmp_path / "preds")
    show = str(tmp_path / "compare")
    evaluator.evaluate(variables, val.dataset, save_path=save,
                       show_image_dir=show)

    colors = np.asarray(
        RGBXDataset.get_class_colors(cfg.dataset.dataset_name), np.uint8)
    item = val.dataset[0]
    name = item["fn"]
    pred = np.asarray(Image.open(os.path.join(save, name + ".png")))
    comp = np.asarray(Image.open(os.path.join(show, name + ".png")))
    H, W = item["rgb"].shape[:2]
    assert comp.shape == (H, 3 * W + 30, 3)  # [img | pred | gt], 15px pivots
    np.testing.assert_array_equal(comp[:, :W], item["rgb"][:, :, ::-1])
    np.testing.assert_array_equal(comp[:, W + 15:2 * W + 15], colors[pred])
    # gt panel: class colors where labeled, white for ignore (show255)
    gt = np.asarray(item["label"])
    gt_panel = comp[:, 2 * W + 30:]
    labeled = gt < len(colors)
    np.testing.assert_array_equal(gt_panel[labeled], colors[gt[labeled]])
    assert (gt_panel[gt == cfg.dataset.background] == 255).all()
