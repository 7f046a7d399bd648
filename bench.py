"""Training-throughput benchmark on the flagship config.

Measures images/sec/chip for the full jitted train step (forward + loss +
backward + AdamW update) of CMX MiT-B2 + MLPDecoder at 480x640 in bf16 — the
configuration behind the reference's MFNet headline results
(reference README.md:153-156, config.py:49-52).

The reference publishes no throughput numbers (BASELINE.json.published == {});
`vs_baseline` is computed against a literature-based A100 estimate for this
model/size (SegFormer-B2 semantic-seg training runs ~40-50 img/s on one A100;
CMX's dual tower + fusion roughly halves that): A100_EST = 20 img/s. The target
from BASELINE.md is >= 2x that per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

A100_EST_IMG_PER_SEC = 20.0


def main():
    import os

    import jax

    # Persistent compilation cache: the remote axon compile of the big train
    # step takes minutes; repeat bench runs hit the cache and finish in seconds.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from rgbx_semantic_segmentation_tpu.config import mfnet_config
    from rgbx_semantic_segmentation_tpu import train as train_lib

    cfg = mfnet_config()  # mit_b2 + MLPDecoder, 480x640, batch 8, bf16 compute
    B = cfg.train.batch_size
    H, W = cfg.dataset.image_height, cfg.dataset.image_width

    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_train_step(cfg)

    rng = np.random.RandomState(0)
    batch = {
        "rgb": jax.device_put(rng.randn(B, H, W, 3).astype(np.float32)),
        "modal_x": jax.device_put(rng.randn(B, H, W, 3).astype(np.float32)),
        "label": jax.device_put(
            rng.randint(0, cfg.dataset.num_classes, size=(B, H, W)).astype(
                np.int32)),
    }

    # Warmup: compile + 2 steps. NOTE: the steps chain through `state`, and the
    # final device_get forces a real round-trip — block_until_ready does not
    # synchronize through the axon remote tunnel, so naive timings are invalid.
    for _ in range(3):
        state, metrics = step(state, batch)
    jax.device_get(metrics["loss"])

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch)
    jax.device_get(metrics["loss"])
    dt = time.perf_counter() - t0

    img_per_sec = n_steps * B / dt
    n_chips = max(jax.device_count(), 1)
    per_chip = img_per_sec / n_chips
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip_mit_b2_480x640_bf16",
        "value": round(per_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip / A100_EST_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
