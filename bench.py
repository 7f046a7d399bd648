"""Training-throughput benchmark on the flagship config.

Measures images/sec/chip for the full jitted train step (forward + loss +
backward + AdamW update) of CMX MiT-B2 + MLPDecoder at 480x640 in bf16 — the
configuration behind the reference's MFNet headline results
(reference README.md:153-156, config.py:49-52).

The reference publishes no throughput numbers (BASELINE.json.published == {});
`vs_baseline` divides by a roofline-DERIVED A100-80GB ceiling for this exact
step (full derivation: BASELINE.md "A100 denominator" — each measured
component of the 90.4 ms v5e step rescaled by the A100/v5e ratio of the
resource that bounds it; an equal-optimization-quality A100 implementation
cannot exceed it). `mfu` is model FLOPs/step (XLA cost analysis of the
compiled step; analytic fallback) / step time / v5e bf16 peak — the step is
activation-BANDWIDTH-bound (docs/PERF.md), so low MFU is structural, and
`hbm_frac` (dense-layer fraction of HBM peak, measured via profile) is the
honest utilization number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu", ...}.
"""
from __future__ import annotations

import json
import time

import numpy as np

# Derived A100-80GB-SXM ceiling for this step, img/s (BASELINE.md "A100
# denominator"): component-wise rescale of the measured v5e profile by
# HBM-BW ratio 1935/819 for BW-bound parts and bf16-peak ratio 312/197 for
# the conv (MXU) part -> ~43 ms/step -> ~186 img/s.
A100_CEILING_IMG_PER_SEC = 186.0
# Central estimate of the REFERENCE IMPLEMENTATION (torch 1.8 eager NCHW,
# AMP, unfused attention) on A100-80GB for this exact step — derived
# analytically in tools/a100_reference_estimate.py, committed to BASELINE.md
# "Reference-implementation A100 estimate". CONSTANT (re-run the tool to
# refresh). v5e lands near per-chip parity (the step is HBM-BW-bound and
# A100 has 2.36x the bandwidth); the per-dollar ratio is ~3-4x.
A100_REFERENCE_EST_IMG_PER_SEC = 96.0
# TPU v5e bf16 peak per chip (Google Cloud TPU v5e docs: 197 TFLOP/s bf16).
V5E_BF16_PEAK_FLOPS = 197e12
# Fallback model FLOPs/step (fwd+loss+bwd+AdamW, mit_b2+MLPDecoder, b8
# 480x640 bf16) when the backend's cost analysis is unavailable: measured
# once via jax cost_analysis on the identical HLO (see BASELINE.md).
FLOPS_PER_STEP_FALLBACK = 2.60e12


def _mark(msg: str) -> None:
    """Progress marker on stderr (stdout stays ONE JSON line for the driver).
    The axon tunnel can wedge 10-15 min after process churn (CLAUDE.md); the
    markers make 'wedged where' diagnosable from a killed run's log."""
    import sys
    import time

    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


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

    _mark("init train state (host)")
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
    _mark("warmup: compile + 3 steps (cold ~2-5 min through the tunnel)")
    for _ in range(3):
        state, metrics = step(state, batch)
    jax.device_get(metrics["loss"])
    _mark("warmup done; timing 20 steps")

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch)
    jax.device_get(metrics["loss"])
    dt = time.perf_counter() - t0

    img_per_sec = n_steps * B / dt
    n_chips = max(jax.device_count(), 1)
    per_chip = img_per_sec / n_chips
    step_s = dt / n_steps

    # Model FLOPs for the compiled step (same executable — the lowering hits
    # the jit cache). cost_analysis support varies by backend/tunnel.
    flops = FLOPS_PER_STEP_FALLBACK
    flops_source = "fallback"
    _mark(f"timed {dt:.1f}s; cost_analysis")
    try:
        cost = step.lower(state, batch).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = float(cost.get("flops", 0.0))
        if f > 0:
            flops = f
            flops_source = "xla_cost_analysis"
    except Exception:
        pass
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip_mit_b2_480x640_bf16",
        "value": round(per_chip, 2),
        "unit": "img/s/chip",
        # Derived A100 ceiling denominator, see BASELINE.md "A100 denominator".
        "vs_baseline": round(per_chip / A100_CEILING_IMG_PER_SEC, 3),
        # vs the REFERENCE IMPLEMENTATION on A100 (central analytic estimate,
        # BASELINE.md "Reference-implementation A100 estimate").
        "vs_reference_a100_est": round(
            per_chip / A100_REFERENCE_EST_IMG_PER_SEC, 3),
        "mfu": round(flops / step_s / V5E_BF16_PEAK_FLOPS, 4),
        "model_tflops_per_step": round(flops / 1e12, 3),
        "flops_source": flops_source,
        # CONSTANT, not recomputed per run: dense-layer fraction of v5e HBM
        # peak measured once from the r3/r4 profiler trace
        # (docs/PERF.md:23-66). The step is activation-bandwidth-bound, so
        # this, not MFU, is the binding utilization — but it only tracks
        # changes when the profile is re-taken (tools/profile_step.py).
        "hbm_frac_dense": 0.77,
    }))


if __name__ == "__main__":
    main()
