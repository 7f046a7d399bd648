"""Unit tests for the shared persistent-cache helper (utils/cache.py) and the
train_cli --niters override plumbing."""
import os

import jax

from rgbx_semantic_segmentation_tpu.utils.cache import enable_persistent_cache


def test_enable_persistent_cache_default_dir():
    got = enable_persistent_cache()
    assert got is not None and got.endswith(".jax_cache")
    assert jax.config.jax_compilation_cache_dir == got


def test_enable_persistent_cache_env_override(tmp_path, monkeypatch):
    override = str(tmp_path / "cache")
    monkeypatch.setenv("RGBX_CACHE_DIR", override)
    got = enable_persistent_cache()
    assert got == override
    assert jax.config.jax_compilation_cache_dir == override
    # restore the default for later tests in this process
    monkeypatch.delenv("RGBX_CACHE_DIR")
    enable_persistent_cache()


def test_enable_persistent_cache_explicit_arg(tmp_path):
    d = str(tmp_path / "explicit")
    assert enable_persistent_cache(d) == d
    enable_persistent_cache()  # restore default


def test_train_cli_niters_rescales_schedule():
    """--niters must rescale niters_per_epoch (and with it total/warmup
    iters, the LR-schedule horizon)."""
    import dataclasses

    from rgbx_semantic_segmentation_tpu.config import get_config

    cfg = get_config("mfnet")
    assert cfg.train.niters_per_epoch == 1176 // 8 + 1
    short = cfg.replace(train=dataclasses.replace(cfg.train,
                                                  niters_per_epoch=60))
    assert short.train.total_iters == short.train.nepochs * 60
    assert short.train.warmup_iters == short.train.warm_up_epoch * 60
