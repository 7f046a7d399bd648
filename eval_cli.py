"""Evaluation entry point.

Parity target: reference `eval.py -e <epochs> [-p save_path]` — checkpoint-range
sweeps over the sliding-window multi-scale/flip evaluator with per-class IoU
tables appended to the val log (reference eval.py:85-122, evaluator.py:42-98).

Usage:
    python eval_cli.py --config mfnet --dataset_root /path/to/MFNet -e 250-400
"""
from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="mfnet")
    parser.add_argument("--dataset_root", default=None)
    parser.add_argument("--train_source", default=None,
                        help="override split file, e.g. train.txt")
    parser.add_argument("--eval_source", default=None,
                        help="override eval split file, e.g. test.txt")
    parser.add_argument("--backbone", default=None)
    parser.add_argument("--decoder", default=None)
    parser.add_argument("-e", "--epochs", default="last",
                        help="'last' | '300' | '250-400' | '250-' | a direct "
                             "checkpoint path (reference evaluator.py:42-81)")
    parser.add_argument("--checkpoint_dir", default=None)
    parser.add_argument("--save_path", "-p", default=None,
                        help="dump raw + palettised prediction PNGs here")
    parser.add_argument("-s", "--show_image", action="store_true",
                        help="save [img|pred|gt] composites (reference "
                             "eval.py:57-65's cv2.imshow view, as files)")
    parser.add_argument("--eval_batch", type=int, default=8,
                        help="images per batched device forward when the eval "
                             "protocol is whole-image (sliding-window images "
                             "fall back per-image); 1 disables batching")
    parser.add_argument("--val_log", default=None)
    parser.add_argument("-d", "--devices", default="",
                        help="device selection for the eval mesh, e.g. "
                             "'0,2-5' or '*' (reference eval.py:88)")
    parser.add_argument("-v", "--verbose", action="store_true",
                        help="log the running metric after every image "
                             "(reference eval.py:89, evaluator.py:138-143)")
    parser.add_argument("--compat-stride-swap", action="store_true",
                        help="replicate the reference's swapped h/w stride "
                             "indices in the sliding grid (reference "
                             "evaluator.py:345-358) — use when scoring "
                             "reference-trained checkpoints under the "
                             "PUBLISHED protocol; golden-tested in "
                             "tests/test_eval_protocol_golden.py")
    parser.add_argument("--compat-double-normalize", action="store_true",
                        help="replicate the reference fork's double "
                             "normalization (ValPre then process_image_rgbX)")
    args = parser.parse_args()

    import dataclasses

    import jax

    from rgbx_semantic_segmentation_tpu.utils.cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    from rgbx_semantic_segmentation_tpu import train as train_lib
    from rgbx_semantic_segmentation_tpu.config import get_config
    from rgbx_semantic_segmentation_tpu.data.loader import ValLoader
    from rgbx_semantic_segmentation_tpu.evaluator import SegEvaluator
    from rgbx_semantic_segmentation_tpu.logger import get_logger

    try:
        cfg = get_config(args.config)
    except KeyError as e:
        raise SystemExit(f"error: {e.args[0]}")
    if args.train_source or args.eval_source:
        ds_kw = {}
        if args.train_source:
            ds_kw["train_source"] = args.train_source
        if args.eval_source:
            ds_kw["eval_source"] = args.eval_source
        cfg = cfg.replace(dataset=dataclasses.replace(cfg.dataset, **ds_kw))
    model_kw = {}
    if args.backbone:
        model_kw["backbone"] = args.backbone
    if args.decoder:
        model_kw["decoder"] = args.decoder
    if model_kw:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, **model_kw))

    logger = get_logger()

    # -e accepts a trained reference torch checkpoint directly: converted
    # on the fly (dual-tower EncoderDecoder state dict; every leaf must be
    # covered). erf GELU is forced for bit-parity with the torch training.
    pth_path = None
    if os.path.isfile(args.epochs) and args.epochs.endswith((".pth", ".pt")):
        pth_path = os.path.abspath(args.epochs)
        if cfg.model.gelu_approximate:
            cfg = cfg.replace(model=dataclasses.replace(
                cfg.model, gelu_approximate=False))
            logger.info("evaluating a torch checkpoint: gelu_approximate "
                        "disabled for erf bit-parity")

    # Structure-only state (zeros, jax.eval_shape): every leaf is overwritten
    # by the checkpoint restore below; the real init program costs ~60-100 s
    # of XLA:CPU compile for nothing.
    state = train_lib.create_eval_state(cfg)

    # -e accepts a direct checkpoint path (reference evaluator.py:42-81's
    # `-e file.pth` form): either an epoch-numbered Orbax step dir or a
    # checkpoint dir (evaluates its latest epoch).
    if pth_path is not None:
        mgr = None
        epochs = [pth_path]
    else:
        from rgbx_semantic_segmentation_tpu.checkpoint import (
            resolve_checkpoint_spec)
        default_dir = args.checkpoint_dir or os.path.join(
            cfg.log_dir, cfg.tag(), "checkpoint")
        mgr, epochs = resolve_checkpoint_spec(args.epochs, default_dir)

    val = ValLoader(cfg, root=args.dataset_root)
    # Batched eval shards stacked images across the mesh's data axis — the
    # reference's multi-GPU eval process fan-out (evaluator.py:117-163) as
    # sharded batch inference.
    from rgbx_semantic_segmentation_tpu.parallel import mesh as mesh_lib
    devices = None
    if args.devices:
        from rgbx_semantic_segmentation_tpu.utils.fs import parse_devices
        all_devices = jax.devices()
        devices = [all_devices[i] for i in parse_devices(args.devices)]
    mesh = mesh_lib.make_mesh(devices)
    evaluator = SegEvaluator(
        cfg, state.apply_fn, mesh=mesh,
        compat_stride_swap=args.compat_stride_swap,
        compat_double_normalize=args.compat_double_normalize)
    show_dir = None
    if args.show_image:
        show_dir = (args.save_path or os.path.join(
            cfg.log_dir, cfg.tag(), "preds")) + "_compare"
    val_log = args.val_log or os.path.join(cfg.log_dir, cfg.tag(),
                                           "val_last.log")
    os.makedirs(os.path.dirname(val_log), exist_ok=True)
    for epoch in epochs:
        if mgr is None:
            from rgbx_semantic_segmentation_tpu import convert
            init_variables = {"params": state.params}
            if state.batch_stats:
                init_variables["batch_stats"] = state.batch_stats
            variables = convert.load_full_model_checkpoint(epoch,
                                                           init_variables)
            epoch = os.path.basename(epoch)
        else:
            st, _ = mgr.restore(state, epoch)
            variables = {"params": st.params}
            if st.batch_stats:
                variables["batch_stats"] = st.batch_stats
        # Params restore onto the host CPU (create_train_state inits there);
        # the batched eval shards images onto the mesh — co-locate.
        variables = mesh_lib.replicate(mesh, variables)
        scores, line = evaluator.evaluate(variables, val.dataset,
                                          save_path=args.save_path,
                                          logger=logger,
                                          eval_batch=args.eval_batch,
                                          show_image_dir=show_dir,
                                          verbose=args.verbose)
        header = f"======= epoch {epoch} ======="
        logger.info("\n%s\n%s", header, line)
        with open(val_log, "a") as f:
            f.write(header + "\n" + line + "\n")
    if mgr is not None:
        mgr.close()


if __name__ == "__main__":
    main()
