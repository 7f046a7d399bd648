"""Input-pipeline throughput benchmark: native C++ ops vs numpy fallback.

Quantifies the native data-path component (rgbx_semantic_segmentation_tpu/native)
on the full TrainPre augmentation chain at MFNet geometry.

Usage:
    python -m rgbx_semantic_segmentation_tpu.tools.bench_input [--n 50]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def run(n: int = 50, hw=(480, 640)) -> dict:
    from rgbx_semantic_segmentation_tpu import native
    from rgbx_semantic_segmentation_tpu.data.preprocess import TrainPre

    rng = np.random.RandomState(0)
    h, w = hw
    rgb = rng.randint(0, 255, (h, w, 3), np.uint8)
    gt = rng.randint(0, 9, (h, w), np.uint8)
    mx = rng.randint(0, 255, (h, w, 3), np.uint8)
    pre = TrainPre(norm_mean=(0.485, 0.456, 0.406),
                   norm_std=(0.229, 0.224, 0.225), image_hw=hw,
                   num_classes=9, train_scale_array=(0.5, 0.75, 1.0, 1.25,
                                                     1.5, 1.75))

    def bench(tag):
        sample_rng = np.random.RandomState(1)
        pre(rgb, gt, mx, rng=np.random.RandomState(0))  # warmup
        t0 = time.perf_counter()
        for i in range(n):
            pre(rgb, gt, mx, rng=np.random.RandomState(i))
        dt = (time.perf_counter() - t0) / n
        return dt

    results = {}
    if native.ensure_built() is not None:
        results["native_ms"] = bench("native") * 1000
    # numpy fallback
    import rgbx_semantic_segmentation_tpu.native as nat_mod

    saved = nat_mod._lib, nat_mod._tried
    nat_mod._lib, nat_mod._tried = None, True
    try:
        results["numpy_ms"] = bench("numpy") * 1000
    finally:
        nat_mod._lib, nat_mod._tried = saved
    if "native_ms" in results:
        results["speedup"] = results["numpy_ms"] / results["native_ms"]
    return results


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=50)
    args = p.parse_args()
    res = run(args.n)
    for k, v in res.items():
        print(f"{k}: {v:.2f}")


if __name__ == "__main__":
    main()
