"""End-to-end CLI smoke: train_cli -> checkpoints -> eval_cli on synthetic data,
with the config preset monkeypatched to a tiny model."""
import os
import sys

import pytest

import train_cli
import eval_cli
from rgbx_semantic_segmentation_tpu.config import (
    DatasetConfig, EvalConfig, ModelConfig, TrainConfig, mfnet_config)
from rgbx_semantic_segmentation_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
    log_dir = str(tmp_path_factory.mktemp("cli_logs"))
    ds = make_synthetic_dataset(str(root), num_train=4, num_val=2,
                                hw=(32, 32), num_classes=4, seed=5)
    cfg = mfnet_config().replace(
        dataset=ds,
        model=ModelConfig(backbone="mit_b0", decoder="MLPDecoder",
                          decoder_embed_dim=64, use_mixed_precision=False,
                          drop_path_rate=0.0),
        train=TrainConfig(batch_size=2, nepochs=2, niters_per_epoch=2,
                          warm_up_epoch=0, lr=1e-3, num_workers=0,
                          train_scale_array=None,
                          checkpoint_start_epoch=1, checkpoint_step=1),
        eval=EvalConfig(eval_scale_array=(1.0,), eval_flip=False,
                        eval_crop_size=(32, 32)),
        log_dir=log_dir,
    )
    return cfg, log_dir


def test_train_then_eval_cli(tiny_setup, monkeypatch, capsys):
    cfg, log_dir = tiny_setup

    def fake_get_config(name, **kw):
        assert name == "tiny"
        return cfg

    monkeypatch.setattr("rgbx_semantic_segmentation_tpu.config.get_config",
                        fake_get_config)
    # The CLIs import get_config inside main(); patch the module they read.
    monkeypatch.setitem(sys.modules, "train_cli", train_cli)

    monkeypatch.setattr(sys, "argv", ["train_cli.py", "--config", "tiny"])
    import rgbx_semantic_segmentation_tpu.config as cfg_mod
    monkeypatch.setattr(cfg_mod, "get_config", fake_get_config)
    train_cli.main()

    ckpt_dir = os.path.join(log_dir, cfg.tag(), "checkpoint")
    assert os.path.isdir(ckpt_dir)
    entries = os.listdir(ckpt_dir)
    assert entries, "no checkpoints written"

    monkeypatch.setattr(sys, "argv", ["eval_cli.py", "--config", "tiny",
                                      "-e", "last"])
    eval_cli.main()
    val_log = os.path.join(log_dir, cfg.tag(), "val_last.log")
    assert os.path.exists(val_log)
    content = open(val_log).read()
    assert "mean_IoU" in content
