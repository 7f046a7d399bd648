"""Tests: fs helpers, multihost batch assembly (single-process path), engine
cadence, logger, metrics writer."""
import json
import os

import numpy as np
import pytest
import jax

from rgbx_semantic_segmentation_tpu.utils.fs import (
    ensure_dir, link_file, parse_devices)
from rgbx_semantic_segmentation_tpu.engine import should_checkpoint
from rgbx_semantic_segmentation_tpu.config import mfnet_config, TrainConfig


def test_ensure_dir_and_link(tmp_path):
    d = ensure_dir(str(tmp_path / "a" / "b"))
    assert os.path.isdir(d)
    f1 = tmp_path / "x.txt"
    f1.write_text("one")
    f2 = tmp_path / "y.txt"
    f2.write_text("two")
    target = str(tmp_path / "latest")
    link_file(str(f1), target)
    assert open(target).read() == "one"
    link_file(str(f2), target)  # atomic re-point
    assert open(target).read() == "two"


def test_parse_devices():
    assert parse_devices("0,2-5", available=8) == [0, 2, 3, 4, 5]
    assert parse_devices("*", available=4) == [0, 1, 2, 3]
    with pytest.raises(ValueError):
        parse_devices("9", available=4)


def test_should_checkpoint_cadence():
    cfg = mfnet_config().replace(train=TrainConfig(
        nepochs=500, checkpoint_start_epoch=350, checkpoint_step=50))
    hits = [e for e in range(1, 501) if should_checkpoint(cfg, e)]
    assert hits == [350, 400, 450, 500]
    # default reference config: start=350 > nepochs=200 -> only final epoch
    cfg2 = mfnet_config().replace(train=TrainConfig(
        nepochs=200, checkpoint_start_epoch=350, checkpoint_step=50))
    hits2 = [e for e in range(1, 201) if should_checkpoint(cfg2, e)]
    assert hits2 == [200]


def test_multihost_single_process_batch():
    from rgbx_semantic_segmentation_tpu.parallel.mesh import make_mesh
    from rgbx_semantic_segmentation_tpu.parallel.multihost import (
        make_global_batch, process_batch_slice)

    assert process_batch_slice(16) == slice(0, 16)
    mesh = make_mesh()
    batch = {"rgb": np.zeros((8, 4, 4, 3), np.float32)}
    out = make_global_batch(mesh, batch)
    assert out["rgb"].shape == (8, 4, 4, 3)
    assert len(out["rgb"].sharding.device_set) == 8


def test_metrics_writer(tmp_path):
    from rgbx_semantic_segmentation_tpu.metrics_writer import MetricsWriter

    w = MetricsWriter(str(tmp_path), use_tensorboard=False)
    w.scalar("train/loss", 1.5, 10)
    w.scalar("train/lr", 1e-4, 10)
    w.close()
    lines = [json.loads(line) for line in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[0]["tag"] == "train/loss"
    assert lines[0]["value"] == 1.5


def test_logger_levels():
    # The process-wide logger is created once and its StreamHandler binds the
    # stderr object live at creation time, so capsys (which swaps sys.stderr
    # per-test) can't see the output when another test created the logger
    # first. Capture through an attached handler instead — order-independent.
    import io
    import logging

    from rgbx_semantic_segmentation_tpu.logger import get_logger

    logger = get_logger()
    buf = io.StringIO()
    handler = logging.StreamHandler(buf)
    logger.addHandler(handler)
    try:
        logger.info("hello-info")
        logger.debug("hello-debug")  # below the default INFO level
    finally:
        logger.removeHandler(handler)
    out = buf.getvalue()
    assert "hello-info" in out
    assert "hello-debug" not in out


def test_preemption_handler_saves_checkpoint(tmp_path):
    """SIGTERM triggers a final checkpoint before exit."""
    import signal

    from rgbx_semantic_segmentation_tpu.config import (
        DatasetConfig, ModelConfig)
    from rgbx_semantic_segmentation_tpu.engine import Engine
    from rgbx_semantic_segmentation_tpu import train as train_lib

    cfg = mfnet_config().replace(
        dataset=DatasetConfig(num_classes=5, image_height=32, image_width=32,
                              class_names=tuple("abcde")),
        model=ModelConfig(backbone="mit_b0", decoder="MLPDecoder",
                          decoder_embed_dim=64, use_mixed_precision=False),
        train=TrainConfig(batch_size=8),
        log_dir=str(tmp_path))
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    with Engine(cfg) as engine:
        engine.install_preemption_handler()
        signal.raise_signal(signal.SIGTERM)
        # The handler only queues (no Orbax I/O in signal context); the train
        # loop polls `preempted` and saves via drain_preemption.
        assert engine.preempted
        assert engine.drain_preemption(7, state, reraise=False)
        assert not engine.preempted
        assert engine.checkpoints.latest_epoch() == 7
        restored, next_epoch = engine.checkpoints.restore(state)
        assert next_epoch == 8
    # restore default handlers for the rest of the suite
    signal.signal(signal.SIGINT, signal.default_int_handler)
    signal.signal(signal.SIGTERM, signal.SIG_DFL)
