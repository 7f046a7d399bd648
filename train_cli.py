"""Training entry point.

Parity target: reference `train.py` CLI semantics (config-driven model/criterion
selection, WarmUpPolyLR + AdamW, epoch loop with per-epoch loss logging,
checkpoint cadence, resume via -c) — but one process drives the whole mesh
instead of torch.distributed.launch's process-per-GPU (reference README.md:127-130).

Usage:
    python train_cli.py --config mfnet --dataset_root /path/to/MFNet [-c]
"""
from __future__ import annotations

import argparse
import time


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="mfnet",
                        help="preset name: mfnet | pst900 | nyu")
    parser.add_argument("--dataset_root", default=None)
    parser.add_argument("--train_source", default=None,
                        help="override split file, e.g. train.txt")
    parser.add_argument("--eval_source", default=None,
                        help="override eval split file, e.g. test.txt")
    parser.add_argument("--backbone", default=None)
    parser.add_argument("--decoder", default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--niters", type=int, default=None,
                        help="override niters_per_epoch (short epochs for "
                             "smoke runs; also rescales the LR schedule "
                             "horizon, which is epochs x niters)")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--pretrained", default=None,
                        help=".pth single-tower backbone checkpoint to convert")
    parser.add_argument("-d", "--devices", default="",
                        help="device selection, e.g. '0,2-5' or '*'")
    parser.add_argument("--mesh", default="dp",
                        help="device-mesh layout: dp (data parallel over all "
                             "devices, default) | dp:N | 2d:D,S (data x "
                             "spatial image-height sharding) | tp:D,M (data "
                             "x model tensor parallelism)")
    parser.add_argument("-c", "--continue", dest="resume", action="store_true")
    parser.add_argument("-p", "--profile_dir", default=None)
    args = parser.parse_args()

    import dataclasses

    import jax

    from rgbx_semantic_segmentation_tpu.utils.cache import (
        enable_persistent_cache)
    enable_persistent_cache()

    from rgbx_semantic_segmentation_tpu import convert, optim, train as train_lib
    from rgbx_semantic_segmentation_tpu.config import get_config
    from rgbx_semantic_segmentation_tpu.data.loader import TrainLoader
    from rgbx_semantic_segmentation_tpu.engine import Engine
    from rgbx_semantic_segmentation_tpu.logger import get_logger
    from rgbx_semantic_segmentation_tpu.metrics_writer import MetricsWriter
    from rgbx_semantic_segmentation_tpu.parallel import mesh as mesh_lib

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
    if args.pretrained:
        model_kw["pretrained_model"] = args.pretrained
    if model_kw:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, **model_kw))
    train_kw = {}
    if args.epochs:
        train_kw["nepochs"] = args.epochs
    if args.niters:
        train_kw["niters_per_epoch"] = args.niters
    if args.batch_size:
        train_kw["batch_size"] = args.batch_size
    if args.lr:
        train_kw["lr"] = args.lr
    if train_kw:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **train_kw))

    logger = get_logger()
    with Engine(cfg, args) as engine:
        # Resume without a pretrained load restores every leaf from the
        # checkpoint — skip the real init program (structure-only state).
        trainer = train_lib.Trainer(
            cfg, mesh=engine.mesh,
            init_values=not (args.resume and not cfg.model.pretrained_model))
        if cfg.model.pretrained_model:
            variables = {"params": jax.device_get(trainer.state.params),
                         "batch_stats": jax.device_get(trainer.state.batch_stats)}
            loaded = convert.load_dualpath_pretrained(
                cfg.model.pretrained_model, variables,
                family=convert.family_for_backbone(cfg.model.backbone))
            trainer.state = trainer.state.replace(
                params=mesh_lib.replicate(engine.mesh, loaded["params"]),
                batch_stats=mesh_lib.replicate(engine.mesh,
                                               loaded["batch_stats"]))
            logger.info("loaded pretrained backbone from %s",
                        cfg.model.pretrained_model)

        start_epoch = 1
        if args.resume:
            trainer.state, start_epoch = engine.restore_checkpoint(trainer.state)
        loader = TrainLoader(cfg, root=args.dataset_root)
        # Scalar logging (lr + epoch loss, matching reference train.py:226-229,
        # 306-307): JSONL always, TensorBoard mirror when available.
        import os as _os
        writer = MetricsWriter(_os.path.join(cfg.log_dir, cfg.tag()))
        engine.install_preemption_handler()
        logger.info("training %s: %d epochs x %d iters, global batch %d",
                    cfg.tag(), cfg.train.nepochs, loader.niters,
                    cfg.train.batch_size)
        for epoch in range(start_epoch, cfg.train.nepochs + 1):
            t0 = time.time()
            trainer.epoch = epoch
            avg_loss = trainer.fit_epoch(iter(loader.epoch(epoch)),
                                         loader.niters, logger=logger,
                                         should_stop=lambda: engine.preempted)
            engine.drain_preemption(epoch, trainer.state)
            step_idx = int(trainer.state.step)
            writer.scalar("train/epoch_loss", avg_loss, epoch)
            # LR read from the optimizer state itself (inject_hyperparams) —
            # provably the value the last update applied. LBFGS keeps a
            # constant lr with no injected state.
            lr_now = optim.applied_lr(trainer.state.opt_state)
            writer.scalar("train/learning_rate",
                          cfg.train.lr if lr_now is None else lr_now, step_idx)
            logger.info("epoch %d/%d loss %.4f (%.1fs, %.2f img/s)",
                        epoch, cfg.train.nepochs, avg_loss, time.time() - t0,
                        loader.niters * cfg.train.batch_size / (time.time() - t0))
            engine.save_checkpoint_if_due(epoch, trainer.state)
        writer.close()


if __name__ == "__main__":
    main()
