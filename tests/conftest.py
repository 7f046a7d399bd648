"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is exercised without TPUs by forcing 8 host platform devices
(see SURVEY.md §4 "Implication for the new framework"). Must run before jax import.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already baked in, so the env var alone is too late —
# force the platform through the live config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Persistent compilation cache: the suite's wall time is dominated by repeated
# XLA:CPU GSPMD compiles (sharding tests alone were >10 min cold in r2).
# Warm reruns skip them entirely. Keyed PER MACHINE (same scheme as
# __graft_entry__._machine_cache_key): XLA:CPU AOT entries embed the compile
# host's CPU features, and loading them on a different host fails at
# cpu_aot_loader.cc:210 — full cold compile anyway plus an error line per
# entry. bench.py's TPU cache stays at the top-level dir.
import __graft_entry__  # noqa: E402  (repo root is on sys.path via rootdir)

_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache", f"cpu-{__graft_entry__._machine_cache_key()}")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

REFERENCE_ROOT = "/root/reference"


def _install_timm_shim():
    """The reference modules import `timm.models.layers` for trunc_normal_/
    DropPath/to_2tuple; timm isn't installed, so provide a minimal shim backed by
    torch so reference modules can be imported for golden-value comparisons."""
    import types
    try:
        import timm  # noqa: F401
        return
    except ImportError:
        pass
    import torch
    import torch.nn as nn

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x / keep * mask

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    layers = types.ModuleType("timm.models.layers")
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    models = types.ModuleType("timm.models")
    models.layers = layers
    timm_mod = types.ModuleType("timm")
    timm_mod.models = models
    sys.modules["timm"] = timm_mod
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def _install_easydict_shim():
    """reference config.py imports easydict; provide the trivial attr-dict."""
    import types
    try:
        import easydict  # noqa: F401
        return
    except ImportError:
        pass

    class EasyDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    mod = types.ModuleType("easydict")
    mod.EasyDict = EasyDict
    sys.modules["easydict"] = mod


def reference_path():
    """Put the reference repo on sys.path (with the timm shim) and return it.

    Reference modules are imported only to compare numerical outputs against —
    never to run in the framework itself.
    """
    _install_timm_shim()
    _install_easydict_shim()
    # py3.10 compat: reference utils/transforms.py:13 uses the pre-3.3
    # `collections.Iterable` alias (removed in 3.10).
    import collections
    import collections.abc
    if not hasattr(collections, "Iterable"):
        collections.Iterable = collections.abc.Iterable
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return REFERENCE_ROOT


# ---------------------------------------------------------------------------
# Fast tier: tests measured >= 33 s on the reference 1-core box are marked
# `slow` here centrally (criterion + numbers: full-suite `--durations=60` run,
# r5 — 268 tests in 82:18; this list is 38 tests totalling ~69 min of it).
# Default working tier: `pytest -m "not slow"` (measured ~14 min on 1 core —
# see pytest.ini / CLAUDE.md). Re-derive the list with
# `pytest tests/ --durations=0` when the balance drifts.
# ---------------------------------------------------------------------------
_SLOW_TESTS = {
    "test_lbfgs_full_train_step_reduces_loss",
    "test_synthetic_convergence_miou",
    "test_trainer_on_2d_mesh_matches_unsharded",
    "test_tp_train_matches_single_device",
    "test_mesh_train_matches_single_device",
    "test_train_step_seed_override_changes_dropout_stream",
    "test_train_then_eval_cli",
    "test_2d_sharded_step_matches_unsharded",
    "test_optimizer_trajectory_golden_vs_torch",
    "test_tp_state_placement",
    "test_tp_checkpoint_roundtrip",
    "test_segnext_towers_untied_with_grads",
    "test_mask2former_train_then_eval",
    "test_gradient_parity_vs_torch",
    "test_uint8_batch_matches_fp32_batch",
    "test_ifrm_iffm_train_step",
    "test_predict_cli_label_free",
    "test_dual_resnet_builder",
    "test_swin_s_full_scale_golden",
    "test_train_eval_checkpoint_resume",
    "test_swin_through_builder_forward",
    "test_swin_remat_forward_backward_equal",
    "test_frozen_stages_zero_grads",
    "test_2d_sharded_step_with_pallas_interpret_matches",
    "test_batch_stats_are_global_across_shards",
    "test_batched_multiscale_flip",
    "test_entry_returns_jittable_forward",
    "test_sgdm_cyclic_full_train_step",
    "test_segnext_forward_shapes",
    "test_mesh_sharded_sliding_grid_matches",
    "test_eval_cli_torch_checkpoint",
    "test_batched_matches_per_image",
    "test_multi_scale_and_flip",
    "test_encoder_decoder_shapes",
    "test_dual_swin_tiny_forward",
    "test_bn_running_stats_golden_vs_torch",
    "test_swin_block_sharded_dispatch_matches_xla",
    "test_loss_decreases_over_steps",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        name = getattr(item, "originalname", None) or item.name
        if name in _SLOW_TESTS:
            item.add_marker(_pytest.mark.slow)
