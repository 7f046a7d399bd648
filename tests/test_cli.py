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


def test_eval_cli_torch_checkpoint(tiny_setup, monkeypatch, tmp_path):
    """eval_cli -e model.pth: a trained reference EncoderDecoder checkpoint is
    converted on the fly and evaluated (conversion contract:
    convert.load_full_model_checkpoint)."""
    import torch

    from tests.conftest import reference_path

    cfg, log_dir = tiny_setup
    reference_path()
    from easydict import EasyDict
    from models.builder import EncoderDecoder as RefModel

    ref_cfg = EasyDict(dict(
        backbone="mit_b0", decoder="MLPDecoder", decoder_embed_dim=64,
        num_classes=cfg.dataset.num_classes, pretrained_model=None,
        bn_eps=1e-3, bn_momentum=0.1))
    tmod = RefModel(cfg=ref_cfg, criterion=None,
                    norm_layer=torch.nn.BatchNorm2d)
    # save in the reference's checkpoint format (engine/engine.py:88-103)
    pth = str(tmp_path / "epoch-last.pth")
    torch.save({"model": tmod.state_dict(), "epoch": 7}, pth)

    def fake_get_config(name, **kw):
        return cfg

    import rgbx_semantic_segmentation_tpu.config as cfg_mod
    monkeypatch.setattr(cfg_mod, "get_config", fake_get_config)
    val_log = str(tmp_path / "val_pth.log")
    monkeypatch.setattr(sys, "argv", ["eval_cli.py", "--config", "tiny",
                                      "-e", pth, "--val_log", val_log])
    eval_cli.main()
    content = open(val_log).read()
    assert "mean_IoU" in content
    assert "epoch-last.pth" in content

    # a checkpoint that doesn't cover the model errors loudly, not silently
    sd = {k: v for k, v in tmod.state_dict().items()
          if "decode_head" not in k}
    pth_bad = str(tmp_path / "partial.pth")
    torch.save({"model": sd}, pth_bad)
    monkeypatch.setattr(sys, "argv", ["eval_cli.py", "--config", "tiny",
                                      "-e", pth_bad, "--val_log", val_log])
    with pytest.raises(KeyError, match="missing"):
        eval_cli.main()


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


def test_predict_cli_label_free(tiny_setup, monkeypatch, tmp_path):
    """predict_cli: label-free inference (BEYOND reference — its eval path
    cannot run without ground truth). Dataset-list mode and single-pair mode
    both produce raw + palettised PNGs (+ composites with -s)."""
    import numpy as np
    from PIL import Image

    import jax
    import predict_cli
    from rgbx_semantic_segmentation_tpu import train as train_lib
    from rgbx_semantic_segmentation_tpu.checkpoint import CheckpointManager

    cfg, log_dir = tiny_setup
    # A checkpoint independent of test order: save an untrained state.
    ckpt_dir = os.path.join(log_dir, cfg.tag(), "checkpoint")
    mgr = CheckpointManager(ckpt_dir)
    if mgr.latest_epoch() is None:
        state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
        mgr.save(1, state, block=True)
    mgr.close()

    def fake_get_config(name, **kw):
        return cfg

    import rgbx_semantic_segmentation_tpu.config as cfg_mod
    monkeypatch.setattr(cfg_mod, "get_config", fake_get_config)

    out = str(tmp_path / "preds")
    monkeypatch.setattr(sys, "argv", ["predict_cli.py", "--config", "tiny",
                                      "-e", "last", "-p", out, "-s"])
    predict_cli.main()

    root = cfg.dataset.dataset_path
    names = [l.strip() for l in
             open(os.path.join(root, cfg.dataset.eval_source)) if l.strip()]
    assert names
    from rgbx_semantic_segmentation_tpu.data.dataset import RGBXDataset
    colors = RGBXDataset.get_class_colors(cfg.dataset.dataset_name)
    for n in names:
        raw = np.asarray(Image.open(os.path.join(out, n + ".png")))
        assert raw.shape == (32, 32)
        assert raw.max() < cfg.dataset.num_classes
        assert os.path.exists(os.path.join(out + "_color", n + ".png"))
        comp = np.asarray(Image.open(os.path.join(out + "_compare", n + ".png")))
        assert comp.shape == (32, 64, 3)  # [image | prediction]
        # The painted half uses the SAME RGB color convention as the
        # palettised PNG (regression: colors were channel-swapped).
        painted = comp[:, 32:]
        np.testing.assert_array_equal(
            painted, np.asarray(colors, np.uint8)[raw])

    # single-pair mode
    out2 = str(tmp_path / "single")
    rgb_path = os.path.join(root, cfg.dataset.rgb_folder,
                            names[0] + cfg.dataset.rgb_format)
    x_path = os.path.join(root, cfg.dataset.x_folder,
                          names[0] + cfg.dataset.x_format)
    monkeypatch.setattr(sys, "argv", ["predict_cli.py", "--config", "tiny",
                                      "-e", "last", "-p", out2,
                                      "--rgb", rgb_path, "--x", x_path])
    predict_cli.main()
    pred1 = np.asarray(Image.open(os.path.join(out2, names[0] + ".png")))
    pred0 = np.asarray(Image.open(os.path.join(out, names[0] + ".png")))
    np.testing.assert_array_equal(pred1, pred0)

    # multi-epoch specs are an eval_cli concept; predict rejects them loudly
    mgr = CheckpointManager(ckpt_dir)
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(1))
    mgr.save(99, state, block=True)
    mgr.close()
    monkeypatch.setattr(sys, "argv", ["predict_cli.py", "--config", "tiny",
                                      "-e", "1-99", "-p", str(tmp_path / "x")])
    with pytest.raises(SystemExit, match="ONE checkpoint"):
        predict_cli.main()
