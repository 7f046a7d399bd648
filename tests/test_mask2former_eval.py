"""Mask2Former eval path (VERDICT r1 #4): the reference returns the
{pred_logits, pred_masks} dict (builder.py:217-230) but never implemented an
eval consumer. Here eval mode composes query masks x class probs into per-pixel
scores so the standard evaluator/CLI pipeline works end to end."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rgbx_semantic_segmentation_tpu.config import (
    DatasetConfig, EvalConfig, ModelConfig, TrainConfig, mfnet_config)
from rgbx_semantic_segmentation_tpu import train as train_lib
from rgbx_semantic_segmentation_tpu.data.loader import TrainLoader, ValLoader
from rgbx_semantic_segmentation_tpu.data.synthetic import make_synthetic_dataset
from rgbx_semantic_segmentation_tpu.evaluator import SegEvaluator
from rgbx_semantic_segmentation_tpu.models.decoders.mask2former import (
    semantic_inference)


def test_semantic_inference_composition():
    """sem = sum_q softmax(logits)[...,:-1] * sigmoid(masks); output is the log
    of that probability in NHWC."""
    rng = np.random.RandomState(0)
    B, Q, C, H, W = 2, 5, 3, 4, 6
    logits = jnp.asarray(rng.randn(B, Q, C + 1), jnp.float32)
    masks = jnp.asarray(rng.randn(B, Q, H, W), jnp.float32)
    out = semantic_inference(logits, masks)
    assert out.shape == (B, H, W, C)
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))[..., :-1]
    sig = 1.0 / (1.0 + np.exp(-np.asarray(masks)))
    expect = np.log(np.einsum("bqc,bqhw->bhwc", probs, sig) + 1e-8)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def m2f_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("m2f_data")
    ds = make_synthetic_dataset(str(root), num_train=4, num_val=2,
                                hw=(32, 32), num_classes=4, seed=2)
    return mfnet_config().replace(
        dataset=ds,
        model=ModelConfig(backbone="mit_b0", decoder="mask2former",
                          use_mixed_precision=False, drop_path_rate=0.0),
        train=TrainConfig(batch_size=2, nepochs=1, niters_per_epoch=2,
                          warm_up_epoch=0, lr=1e-4, num_workers=0,
                          train_scale_array=None),
        eval=EvalConfig(eval_scale_array=(1.0,), eval_flip=False,
                        eval_crop_size=(32, 32)),
    )


def test_mask2former_train_then_eval(m2f_cfg):
    """Train a few steps on the dict path, then run the standard evaluator:
    eval mode must yield per-pixel logits and a mIoU table."""
    cfg = m2f_cfg
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_train_step(cfg)
    loader = TrainLoader(cfg, num_workers=0)
    for batch in loader.epoch(0):
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))

    # Eval-mode forward returns composed per-pixel scores, not the dict.
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    rgb = jnp.zeros((1, 32, 32, 3), jnp.float32)
    out = state.apply_fn(variables, rgb, rgb, False)
    assert not isinstance(out, dict)
    assert out.shape == (1, 32, 32, cfg.dataset.num_classes)

    val = ValLoader(cfg)
    evaluator = SegEvaluator(cfg, state.apply_fn)
    scores, line = evaluator.evaluate(variables, val.dataset, eval_batch=2)
    assert "mean_IoU" in line
    assert 0.0 <= scores.pixel_acc <= 1.0
