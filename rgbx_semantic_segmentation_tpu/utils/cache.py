"""Persistent XLA compilation cache setup shared by every entry point.

The reference has no equivalent subsystem (its CUDA kernels ship precompiled);
on TPU the remote compile of the big train step costs minutes, so every CLI
(train/eval/predict), bench.py and the tools enable a persistent on-disk cache.
Location: $RGBX_CACHE_DIR if set, else `.jax_cache/` next to the repo root
(the package's parent directory).
"""
from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 5.0) -> str | None:
    """Point JAX's persistent compilation cache at `cache_dir`.

    Must run before the first compilation. Returns the directory used, or
    None when the running jax does not support the config knob.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("RGBX_CACHE_DIR")
    if cache_dir is None:
        # <repo>/rgbx_semantic_segmentation_tpu/utils/cache.py -> <repo>/.jax_cache
        pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cache_dir = os.path.join(os.path.dirname(pkg_dir), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        return None
    return cache_dir
