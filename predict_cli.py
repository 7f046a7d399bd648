"""Inference entry point: segment unlabeled RGB-X image pairs.

BEYOND the reference: its eval path requires ground-truth labels for every
image (reference eval.py:23-83 / engine/evaluator.py:306-432 accumulate a
confusion matrix against gt), so a trained model cannot be run on new data
at all. This CLI runs the exact eval inference protocol — multi-scale + flip
sliding-window with exp-score summation, the same BGR/normalization pipeline
as training — without labels, and dumps raw class-index PNGs plus palettised
PNGs (and optional [image | prediction] composites).

Inputs: either `--dataset_root` + `--source names.txt` (names resolved
through the config's rgb/x folder layout, like training), or a single
`--rgb img.png --x modal.png` pair.

Usage:
    python predict_cli.py --config mfnet --dataset_root /data/MFNet \\
        --source predict.txt -e last -p out/
    python predict_cli.py --config mfnet --rgb 1.png --x 1_th.png -e last
"""
from __future__ import annotations

import argparse
import os
import time


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="mfnet")
    parser.add_argument("--dataset_root", default=None)
    parser.add_argument("--source", default=None,
                        help="file of image names (no extensions), resolved "
                             "through the config's rgb/x folders; default: "
                             "the config's eval_source")
    parser.add_argument("--rgb", default=None,
                        help="single RGB image path (with --x; bypasses "
                             "--dataset_root/--source)")
    parser.add_argument("--x", default=None,
                        help="single modal image path (thermal/HHA/...)")
    parser.add_argument("--backbone", default=None)
    parser.add_argument("--decoder", default=None)
    parser.add_argument("-e", "--epochs", default="last",
                        help="'last' | '300' | an Orbax epoch/checkpoint dir "
                             "| a reference torch .pth (converted on the fly)")
    parser.add_argument("--checkpoint_dir", default=None)
    parser.add_argument("--save_path", "-p", default=None,
                        help="output dir (default logs/<tag>/predict); raw "
                             "class PNGs here, palettised in <dir>_color")
    parser.add_argument("-s", "--composite", action="store_true",
                        help="also save [image | prediction] composites in "
                             "<save_path>_compare")
    args = parser.parse_args()
    if (args.rgb is None) != (args.x is None):
        parser.error("--rgb and --x must be given together")

    import dataclasses

    import numpy as np

    from rgbx_semantic_segmentation_tpu.utils.cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    from rgbx_semantic_segmentation_tpu import train as train_lib
    from rgbx_semantic_segmentation_tpu.checkpoint import resolve_checkpoint_spec
    from rgbx_semantic_segmentation_tpu.config import get_config
    from rgbx_semantic_segmentation_tpu.data.dataset import (
        RGBXDataset, load_modal_image, load_rgbx_pair, _imread)
    from rgbx_semantic_segmentation_tpu.evaluator import SegEvaluator
    from rgbx_semantic_segmentation_tpu.logger import get_logger

    try:
        cfg = get_config(args.config)
    except KeyError as e:
        raise SystemExit(f"error: {e.args[0]}")
    model_kw = {}
    if args.backbone:
        model_kw["backbone"] = args.backbone
    if args.decoder:
        model_kw["decoder"] = args.decoder
    if model_kw:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, **model_kw))

    logger = get_logger()

    pth_path = None
    if os.path.isfile(args.epochs) and args.epochs.endswith((".pth", ".pt")):
        pth_path = os.path.abspath(args.epochs)
        if cfg.model.gelu_approximate:
            cfg = cfg.replace(model=dataclasses.replace(
                cfg.model, gelu_approximate=False))
            logger.info("torch checkpoint: gelu_approximate disabled for erf "
                        "bit-parity")

    state = train_lib.create_eval_state(cfg)
    if pth_path is not None:
        from rgbx_semantic_segmentation_tpu import convert

        init_variables = {"params": state.params}
        if state.batch_stats:
            init_variables["batch_stats"] = state.batch_stats
        variables = convert.load_full_model_checkpoint(pth_path, init_variables)
        ckpt_label = os.path.basename(pth_path)
        mgr = None
    else:
        default_dir = args.checkpoint_dir or os.path.join(
            cfg.log_dir, cfg.tag(), "checkpoint")
        mgr, epochs = resolve_checkpoint_spec(args.epochs, default_dir)
        if len(epochs) > 1:
            raise SystemExit(
                f"predict_cli takes ONE checkpoint; -e {args.epochs!r} matches "
                f"epochs {epochs} — use eval_cli for epoch sweeps")
        st, _ = mgr.restore(state, epochs[-1])
        variables = {"params": st.params}
        if st.batch_stats:
            variables["batch_stats"] = st.batch_stats
        ckpt_label = f"epoch {epochs[-1]}"

    # Work list: (name, rgb, modal_x) — raw BGR uint8 pairs, exactly what the
    # eval protocol's sliding_eval_rgbx expects. Pairs are decoded lazily, one
    # per iteration — thousands of images must not be resident at once.
    if args.rgb is not None:
        names = [os.path.splitext(os.path.basename(args.rgb))[0]]

        def iter_items():
            yield (names[0], _imread(args.rgb),
                   load_modal_image(cfg.dataset, args.x))
    else:
        root = args.dataset_root or cfg.dataset.dataset_path
        source = args.source or cfg.dataset.eval_source
        source = source if os.path.isabs(source) else os.path.join(root, source)
        with open(source) as f:
            names = [line.strip() for line in f if line.strip()]

        def iter_items():
            for n in names:
                yield (n,) + load_rgbx_pair(cfg.dataset, root, n)

    save_path = args.save_path or os.path.join(cfg.log_dir, cfg.tag(),
                                               "predict")
    evaluator = SegEvaluator(cfg, state.apply_fn)
    colors = RGBXDataset.get_class_colors(cfg.dataset.dataset_name)
    logger.info("predicting %d image(s) with %s -> %s", len(names),
                ckpt_label, save_path)
    t0 = time.time()
    for i, (name, rgb, x) in enumerate(iter_items()):
        pred = evaluator.sliding_eval_rgbx(variables, rgb, x)
        evaluator._save_prediction(pred, name, save_path)
        if args.composite:
            from PIL import Image

            from rgbx_semantic_segmentation_tpu import visualize

            # Paint class colors into the RGB-order photo: get_class_colors
            # triples are RGB (the palettised PNGs treat them as such), while
            # the pipeline's images are BGR — convert first so composite and
            # palette colors agree.
            rgb_view = rgb[:, :, ::-1]
            painted = visualize.show_prediction(colors, cfg.dataset.background,
                                                rgb_view, pred, pred)
            comp = np.concatenate([rgb_view, painted], axis=1)
            out_dir = save_path + "_compare"
            os.makedirs(out_dir, exist_ok=True)
            Image.fromarray(comp.astype(np.uint8)).save(
                os.path.join(out_dir, name + ".png"))
        logger.info("predict %d/%d %s (%.2f img/s)", i + 1, len(names), name,
                    (i + 1) / (time.time() - t0))
    if mgr is not None:
        mgr.close()


if __name__ == "__main__":
    main()
