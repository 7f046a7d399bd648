"""Driver-interface contract: `__graft_entry__.py` and `bench.py` are the
round driver's only hooks into this repo (entry() -> (fn, example_args) that
jits; dryrun_multichip(n_devices); bench prints ONE JSON line). A regression
here silently zeroes the round's bench/compile checks, so pin the contract
on the CPU suite — at tiny geometry, since the flagship 480x640 init is a
multi-minute CPU compute.
"""
import inspect

import jax
import jax.numpy as jnp


def _tiny_cfg():
    from rgbx_semantic_segmentation_tpu.config import (
        DatasetConfig, ModelConfig, mfnet_config)

    return mfnet_config().replace(
        dataset=DatasetConfig(num_classes=5, image_height=32, image_width=32,
                              class_names=tuple("abcde")),
        model=ModelConfig(backbone="mit_b0", decoder="MLPDecoder",
                          decoder_embed_dim=64, use_mixed_precision=True),
    )


def test_entry_returns_jittable_forward(monkeypatch):
    import __graft_entry__ as ge

    monkeypatch.setattr(ge, "_flagship_cfg", _tiny_cfg)
    fn, args = ge.entry()
    assert callable(fn) and isinstance(args, tuple)
    out = jax.jit(fn)(*args)
    # Driver prints `out.shape, out.dtype`; eval logits are (B, H, W, C) bf16.
    assert out.shape == (1, 32, 32, 5)
    assert out.dtype == jnp.bfloat16


def test_dryrun_multichip_signature():
    import __graft_entry__ as ge

    sig = inspect.signature(ge.dryrun_multichip)
    assert list(sig.parameters) == ["n_devices"]
    # The full dryrun is exercised standalone (`python __graft_entry__.py
    # dryrun 8`); calling it here would mutate XLA_FLAGS for the whole suite.


def test_bench_module_importable():
    import bench

    assert callable(bench.main)
    assert bench.A100_CEILING_IMG_PER_SEC > 0
    assert bench.V5E_BF16_PEAK_FLOPS > 0
    assert bench.FLOPS_PER_STEP_FALLBACK > 0
