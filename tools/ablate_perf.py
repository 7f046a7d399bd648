"""Per-stage / per-op ablation timing of the flagship train step on the TPU.

Answers "where do the 129 ms go?" for CMX mit_b2 + MLPDecoder @ 480x640 b8 bf16
(VERDICT r1 next-steps #1). All timings chain into jax.device_get — the axon
tunnel does not honour block_until_ready (CLAUDE.md).

Usage:
    python tools/ablate_perf.py head    # full train-step variants
    python tools/ablate_perf.py micro   # per-component fwd+bwd micro benches
    python tools/ablate_perf.py oom     # expected-to-OOM configs, run last
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = {}


def _setup_cache():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def report(name, ms, extra=""):
    RESULTS[name] = round(ms, 3)
    print(f"{name:52s} {ms:9.2f} ms  {extra}", flush=True)


def timeit(fn, args, iters=15, warmup=3):
    """Dispatch `iters` executions, sync once at the end. In-order execution
    on one TPU core => device_get(last) bounds them all."""
    import jax
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms


# mit_b2 @ 480x640 stage geometry: (H, W, C, heads, sr, depth)
STAGES = [
    (120, 160, 64, 1, 8, 3),
    (60, 80, 128, 2, 4, 4),
    (30, 40, 320, 5, 2, 6),
    (15, 20, 512, 8, 1, 3),
]
B = 8
H_IMG, W_IMG = 480, 640


def make_batch(rng, b):
    import jax
    return {
        "rgb": jax.device_put(rng.randn(b, H_IMG, W_IMG, 3).astype(np.float32)),
        "modal_x": jax.device_put(
            rng.randn(b, H_IMG, W_IMG, 3).astype(np.float32)),
        "label": jax.device_put(
            rng.randint(0, 9, size=(b, H_IMG, W_IMG)).astype(np.int32)),
    }


def train_step_ms(cfg, b, rng):
    import jax
    from rgbx_semantic_segmentation_tpu import train as train_lib
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_train_step(cfg)
    batch = make_batch(rng, b)
    s = state
    for _ in range(3):
        s, m = step(s, batch)
    jax.device_get(m["loss"])
    n = 15
    t0 = time.perf_counter()
    for _ in range(n):
        s, m = step(s, batch)
    jax.device_get(m["loss"])
    return (time.perf_counter() - t0) / n * 1e3


def section_head():
    import dataclasses

    import jax

    from rgbx_semantic_segmentation_tpu import train as train_lib
    from rgbx_semantic_segmentation_tpu.config import mfnet_config

    rng = np.random.RandomState(0)
    cfg = mfnet_config()
    ms = train_step_ms(cfg, B, rng)
    report(f"train_step b{B} (baseline)", ms, f"{B / ms * 1e3:.1f} img/s")
    cfg_pallas = cfg.replace(
        model=dataclasses.replace(cfg.model, use_pallas_kernels=True))
    ms = train_step_ms(cfg_pallas, B, rng)
    report(f"train_step b{B} flash-attn", ms, f"{B / ms * 1e3:.1f} img/s")
    cfg_remat = cfg.replace(model=dataclasses.replace(cfg.model, remat=True))
    ms = train_step_ms(cfg_remat, B, rng)
    report(f"train_step b{B} remat", ms, f"{B / ms * 1e3:.1f} img/s")
    ms = train_step_ms(cfg_remat, 16, rng)
    report("train_step b16 remat", ms, f"{16 / ms * 1e3:.1f} img/s")

    # create_train_state inits on the host CPU — device_put first, or every
    # dispatch re-uploads the params through the tunnel (~7.7 s/call!).
    state = jax.device_put(train_lib.create_train_state(
        cfg, jax.random.PRNGKey(0)), jax.devices()[0])
    ev = train_lib.make_eval_step(cfg)
    batch = make_batch(rng, B)
    report(f"eval_forward b{B}",
           timeit(ev, (state, batch["rgb"], batch["modal_x"])))


def section_oom():
    import jax  # noqa: F401

    from rgbx_semantic_segmentation_tpu.config import mfnet_config

    rng = np.random.RandomState(0)
    cfg = mfnet_config()
    try:
        ms = train_step_ms(cfg, 16, rng)
        report("train_step b16 no-remat", ms, f"{16 / ms * 1e3:.1f} img/s")
    except Exception as e:
        print(f"train_step b16 no-remat FAILED: {type(e).__name__}", flush=True)


def section_backbones():
    """Train-step breadth table: every encoder family at the flagship geometry
    (480x640 b8 bf16, MLPDecoder unless noted). One compile each (~2 min
    through the tunnel, cached after)."""
    import dataclasses

    from rgbx_semantic_segmentation_tpu.config import mfnet_config

    rng = np.random.RandomState(0)
    base = mfnet_config()
    variants = [
        ("mit_b0", dict(backbone="mit_b0", decoder_embed_dim=256)),
        ("mit_b1", dict(backbone="mit_b1", decoder_embed_dim=256)),
        ("mit_b2 (flagship)", dict()),
        ("mit_b2pp (IFRM/IFFM)", dict(backbone="mit_b2pp")),
        ("mit_b4 + remat", dict(backbone="mit_b4", remat=True)),
        ("swin_s", dict(backbone="swin_s")),
        ("dual_resnet50", dict(backbone="resnet50")),
        ("mit_b2 + UPernet", dict(decoder="UPernet")),
        ("mit_b2 + deeplabv3+", dict(decoder="deeplabv3+")),
    ]
    only = os.environ.get("RGBX_ABL_ONLY")
    for name, kw in variants:
        if only and only not in name:
            continue
        b = 4 if "b4" in name else B
        cfg = base.replace(model=dataclasses.replace(base.model, **kw))
        try:
            ms = train_step_ms(cfg, b, rng)
            report(f"train_step b{b} {name}", ms, f"{b / ms * 1e3:.1f} img/s")
        except Exception as e:
            print(f"train_step {name} FAILED: {type(e).__name__}: {e}",
                  flush=True)


def section_batchcurve():
    """Train-side img/s vs batch, remat off and on (VERDICT r4 weak-#5): the
    headline b8 must demonstrably be the argmax over batch. b8/b16 endpoints
    were measured in r2 (PERF.md); this adds b12 and re-runs the set
    back-to-back on one quiet box."""
    import dataclasses

    from rgbx_semantic_segmentation_tpu.config import mfnet_config

    rng = np.random.RandomState(0)
    base = mfnet_config()
    remat = base.replace(model=dataclasses.replace(base.model, remat=True))
    for b in (8, 12, 16):
        for tag, cfg in (("", base), (" remat", remat)):
            try:
                ms = train_step_ms(cfg, b, rng)
                report(f"train_step b{b}{tag}", ms, f"{b / ms * 1e3:.1f} img/s")
            except Exception as e:
                print(f"train_step b{b}{tag} FAILED: {type(e).__name__}",
                      flush=True)


def section_swin():
    """swin_s flagship-geometry step only — for window-kernel tuning sweeps
    driven by env vars (RGBX_WIN_PACK_TOKENS / *_TARGET), which are read at
    module import, hence one process per setting."""
    import dataclasses

    from rgbx_semantic_segmentation_tpu.config import mfnet_config

    rng = np.random.RandomState(0)
    cfg = mfnet_config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, backbone="swin_s"))
    pt = os.environ.get("RGBX_WIN_PACK_TOKENS", "256")
    ms = train_step_ms(cfg, B, rng)
    report(f"train_step b{B} swin_s pack={pt}", ms, f"{B / ms * 1e3:.1f} img/s")


def section_u8():
    """Train step fed uint8 batches (the PRODUCT path: TrainLoader ships
    uint8, _prep normalizes on device) vs bench.py's fp32 batches — 4x less
    H2D and stage-0 HBM read; quantifies whether the headline should be
    measured on the uint8 variant."""
    import jax

    from rgbx_semantic_segmentation_tpu import train as train_lib
    from rgbx_semantic_segmentation_tpu.config import mfnet_config

    rng = np.random.RandomState(0)
    cfg = mfnet_config()
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_train_step(cfg)
    u8 = {
        "rgb": jax.device_put(rng.randint(0, 256, (B, H_IMG, W_IMG, 3)).astype(
            np.uint8)),
        "modal_x": jax.device_put(rng.randint(0, 256, (B, H_IMG, W_IMG, 3))
                                  .astype(np.uint8)),
        "label": jax.device_put(rng.randint(0, 9, (B, H_IMG, W_IMG)).astype(
            np.int32)),
    }
    s = state
    for _ in range(3):
        s, m = step(s, u8)
    jax.device_get(m["loss"])
    n = 15
    t0 = time.perf_counter()
    for _ in range(n):
        s, m = step(s, u8)
    jax.device_get(m["loss"])
    ms = (time.perf_counter() - t0) / n * 1e3
    report(f"train_step b{B} uint8-batch (product path)", ms,
           f"{B / ms * 1e3:.1f} img/s")


def section_evalbatch():
    """Serving sweep: whole-image eval forward vs batch size (flagship
    config). Finds the throughput-optimal --eval_batch."""
    import jax
    import jax.numpy as jnp

    from rgbx_semantic_segmentation_tpu.config import mfnet_config
    from rgbx_semantic_segmentation_tpu import train as train_lib

    rng = np.random.RandomState(0)
    cfg = mfnet_config()
    state = jax.device_put(train_lib.create_train_state(
        cfg, jax.random.PRNGKey(0)), jax.devices()[0])
    ev = train_lib.make_eval_step(cfg)

    # Time the real serving path: device argmax + uint8 preds. Timing the raw
    # logits forward instead measures the harness, not the model — 15 queued
    # executions each pin an 88 MB (b8 fp32) output buffer, and the axon
    # tunnel's flow control serializes on them (measured 132 ms/b8 vs the
    # true 30 ms; b16 read an absurd 818 ms).
    @jax.jit
    def ev_pred(state, rgb, modal_x):
        return jnp.argmax(ev(state, rgb, modal_x), axis=-1).astype(jnp.uint8)

    for b in (1, 4, 8, 16, 32):
        batch = make_batch(rng, b)
        try:
            ms = timeit(ev_pred, (state, batch["rgb"], batch["modal_x"]))
            report(f"eval_pred b{b}", ms, f"{b / ms * 1e3:.1f} img/s")
        except Exception as e:
            print(f"eval_forward b{b} FAILED: {type(e).__name__}", flush=True)


def section_micro():
    import jax
    import jax.numpy as jnp

    from rgbx_semantic_segmentation_tpu.models import fusion
    from rgbx_semantic_segmentation_tpu.models.encoders import dual_segformer

    rng = np.random.RandomState(0)
    dtype = jnp.bfloat16
    init_rngs = {"params": jax.random.PRNGKey(0),
                 "droppath": jax.random.PRNGKey(1),
                 "dropout": jax.random.PRNGKey(2)}
    apply_rngs = {"droppath": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)}

    def bench_grad(name, mod, arrays, static_tail=(), train=True):
        """fwd+bwd cost of one module: grad of sum(outputs) wrt params."""
        variables = mod.init(init_rngs, *arrays, *static_tail, train)
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
        mutable = list(extra.keys())

        def loss_fn(p, *xs):
            out = mod.apply({"params": p, **extra}, *xs, *static_tail, train,
                            rngs=apply_rngs, mutable=mutable)
            if mutable:
                out = out[0]
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        f = jax.jit(jax.grad(loss_fn))
        ms = timeit(f, (params, *arrays))
        report(name, ms)
        return ms

    tot_blocks = 0.0
    per_stage = []
    for si, (h, w, c, heads, sr, depth) in enumerate(STAGES):
        x = jax.device_put(
            rng.randn(B, h * w, c).astype(np.float32).astype(dtype))
        blk = dual_segformer.Block(dim=c, num_heads=heads, mlp_ratio=4.0,
                                   qkv_bias=True, sr_ratio=sr, dtype=dtype)
        ms = bench_grad(f"stage{si + 1} block fwd+bwd (x1)", blk, (x,), (h, w))
        per_stage.append(ms * depth * 2)
        tot_blocks += ms * depth * 2
        # attention-only and mlp-only splits
        attn = dual_segformer.Attention(dim=c, num_heads=heads, qkv_bias=True,
                                        sr_ratio=sr, dtype=dtype)
        bench_grad(f"stage{si + 1}   attn-only fwd+bwd", attn, (x,), (h, w))
        mlp = dual_segformer.Mlp(in_features=c, hidden_features=4 * c,
                                 dtype=dtype)
        bench_grad(f"stage{si + 1}   mixffn-only fwd+bwd", mlp, (x,), (h, w))
    for si, ms in enumerate(per_stage):
        report(f"stage{si + 1} blocks total (both towers)", ms)
    report("SUM blocks (both towers, fwd+bwd)", tot_blocks)

    tot_fuse = 0.0
    for si, (h, w, c, heads, sr, depth) in enumerate(STAGES):
        m1 = jax.device_put(
            rng.randn(B, h, w, c).astype(np.float32).astype(dtype))
        m2 = jax.device_put(
            rng.randn(B, h, w, c).astype(np.float32).astype(dtype))
        frm = fusion.FeatureRectifyModule(dim=c, reduction=1, dtype=dtype)
        ms1 = bench_grad(f"stage{si + 1} FRM fwd+bwd", frm, (m1, m2))
        ffm = fusion.FeatureFusionModule(dim=c, reduction=1, num_heads=heads,
                                         dtype=dtype)
        ms2 = bench_grad(f"stage{si + 1} FFM fwd+bwd", ffm, (m1, m2))
        tot_fuse += ms1 + ms2
    report("SUM FRM+FFM (fwd+bwd)", tot_fuse)

    from rgbx_semantic_segmentation_tpu.models.encoders.dual_segformer import (
        OverlapPatchEmbed)
    pe_shapes = [(480, 640, 3, 7, 4, 64), (120, 160, 64, 3, 2, 128),
                 (60, 80, 128, 3, 2, 320), (30, 40, 320, 3, 2, 512)]
    tot_pe = 0.0
    for si, (h, w, cin, k, st, cout) in enumerate(pe_shapes):
        x = jax.device_put(
            rng.randn(B, h, w, cin).astype(np.float32).astype(dtype))
        pe = OverlapPatchEmbed(k, st, cout, dtype=dtype)
        variables = pe.init(jax.random.PRNGKey(0), x)

        def loss_fn(p, xx):
            out = pe.apply({"params": p}, xx)[0]
            return jnp.sum(out.astype(jnp.float32))

        f = jax.jit(jax.grad(loss_fn))
        ms = timeit(f, (variables["params"], x))
        report(f"stage{si + 1} patch_embed fwd+bwd", ms)
        tot_pe += ms * 2
    report("SUM patch embeds (both towers)", tot_pe)

    from rgbx_semantic_segmentation_tpu.models.decoders.mlp_decoder import (
        MLPDecoder)
    feats = [jax.device_put(
        rng.randn(B, h, w, c).astype(np.float32).astype(dtype))
        for (h, w, c, *_r) in STAGES]
    dec = MLPDecoder(num_classes=9, embed_dim=512, dtype=dtype)
    bench_grad("MLPDecoder fwd+bwd", dec, (feats,))


def main():
    section = sys.argv[1] if len(sys.argv) > 1 else "head"
    _setup_cache()
    if section == "head":
        section_head()
    elif section == "micro":
        section_micro()
    elif section == "oom":
        section_oom()
    elif section == "backbones":
        section_backbones()
    elif section == "evalbatch":
        section_evalbatch()
    elif section == "batchcurve":
        section_batchcurve()
    elif section == "u8":
        section_u8()
    elif section == "swin":
        section_swin()
    else:
        raise SystemExit(f"unknown section {section}")
    print("JSON " + json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
