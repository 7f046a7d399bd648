"""Profile the flagship train step on the TPU and print an op-level breakdown.

jax.profiler works through the axon tunnel (CLAUDE.md); the trace lands in a
temp dir and is parsed offline from trace.json.gz (Chrome trace format — each
complete event carries dur/us and HLO metadata in args).

Usage:
    python tools/profile_step.py [--top 40] [--out /tmp/trace_dir]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_traced(out_dir: str, batch: int = 8, backbone: str = None,
               decoder: str = None):
    import dataclasses

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from rgbx_semantic_segmentation_tpu.config import mfnet_config
    from rgbx_semantic_segmentation_tpu import train as train_lib

    cfg = mfnet_config()
    model_kw = {}
    if backbone:
        model_kw["backbone"] = backbone
    if decoder:
        model_kw["decoder"] = decoder
    if model_kw:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, **model_kw))
    rng = np.random.RandomState(0)
    b = {
        "rgb": jax.device_put(rng.randn(batch, 480, 640, 3).astype(np.float32)),
        "modal_x": jax.device_put(
            rng.randn(batch, 480, 640, 3).astype(np.float32)),
        "label": jax.device_put(
            rng.randint(0, 9, size=(batch, 480, 640)).astype(np.int32)),
    }
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_train_step(cfg)
    s = state
    for _ in range(3):
        s, m = step(s, b)
    jax.device_get(m["loss"])
    jax.profiler.start_trace(out_dir)
    for _ in range(5):
        s, m = step(s, b)
    jax.device_get(m["loss"])
    jax.profiler.stop_trace()


def parse(out_dir: str, top: int, steps: int = 5):
    paths = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace under {out_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    per_op = collections.Counter()
    per_cat = collections.Counter()
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        pid_name = ev.get("pid")
        name = ev.get("name", "")
        args = ev.get("args") or {}
        # Keep only device-side XLA op events (they carry HLO metadata).
        if "tf_op" not in args and "long_name" not in args and \
                not name.startswith(("fusion", "copy", "convolution", "dot",
                                     "custom-call", "reduce", "transpose",
                                     "dynamic", "select", "scatter", "bitcast",
                                     "broadcast", "iota", "concatenate",
                                     "slice", "pad", "convert", "rsqrt",
                                     "all-reduce", "tuple", "infeed",
                                     "outfeed")):
            continue
        dur_ms = ev["dur"] / 1e3 / steps
        total += dur_ms
        per_op[name] += dur_ms
        cat = name.split(".")[0].rstrip("0123456789")
        per_cat[cat] += dur_ms
    print(f"\n== trace {os.path.basename(path)}  total {total:.2f} ms/step")
    print("-- by category:")
    for cat, ms in per_cat.most_common(15):
        print(f"  {cat:34s} {ms:8.3f} ms")
    print(f"-- top {top} ops:")
    for name, ms in per_op.most_common(top):
        print(f"  {name:60s} {ms:8.3f} ms")
    return per_op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--out", default=None)
    ap.add_argument("--backbone", default=None)
    ap.add_argument("--decoder", default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    out = args.out or "/tmp/trace_base"
    if not args.parse_only:
        run_traced(out, batch=args.batch, backbone=args.backbone,
                   decoder=args.decoder)
    parse(out, args.top)


if __name__ == "__main__":
    main()
