"""Training engine: run lifecycle, checkpoint cadence, profiling hooks.

Parity target: reference `engine/engine.py:29-163` (Engine context manager with
arg parsing, DDP init, State, checkpoint save/restore) — re-designed for the
single-controller JAX runtime:
  - no process-per-device zoo: `jax.distributed.initialize()` once for
    multi-host, a Mesh for everything else (parallel/mesh.py)
  - checkpoint cadence matching train.py:310-318 (start epoch / step / final)
  - first-class profiling via jax.profiler (the reference has none, SURVEY §5)
"""
from __future__ import annotations

import argparse
import contextlib
import os
import time
from typing import Iterator, Optional

import jax

from rgbx_semantic_segmentation_tpu.checkpoint import CheckpointManager
from rgbx_semantic_segmentation_tpu.config import Config
from rgbx_semantic_segmentation_tpu.logger import get_logger


def default_parser(parser: Optional[argparse.ArgumentParser] = None):
    """Injects the default flags (reference engine.py:62-75)."""
    p = parser or argparse.ArgumentParser()
    p.add_argument("-d", "--devices", default="", help="device selection")
    p.add_argument("-c", "--continue", dest="continue_fpath", default=None,
                   help="checkpoint dir to resume from")
    p.add_argument("--dataset_root", default=None,
                   help="override dataset root path")
    p.add_argument("-p", "--profile_dir", default=None,
                   help="write jax profiler traces here")
    return p


def should_checkpoint(cfg: Config, epoch: int) -> bool:
    """Checkpoint cadence (reference train.py:310-318): from
    checkpoint_start_epoch every checkpoint_step epochs, plus the final epoch."""
    tc = cfg.train
    if epoch == tc.nepochs:
        return True
    return (epoch >= tc.checkpoint_start_epoch
            and (epoch - tc.checkpoint_start_epoch) % tc.checkpoint_step == 0)


class Engine:
    """Run lifecycle wrapper. Usage:

        with Engine(cfg) as engine:
            trainer = Trainer(cfg, mesh=engine.mesh)
            ...
    """

    def __init__(self, cfg: Config, args: Optional[argparse.Namespace] = None,
                 multihost: bool = False):
        self.cfg = cfg
        self.args = args
        self.logger = get_logger()
        if multihost:
            # Multi-host rendezvous (replaces NCCL env:// init, reference
            # engine.py:55-56). On single-host this is a no-op.
            jax.distributed.initialize()
        from rgbx_semantic_segmentation_tpu.parallel import mesh as mesh_lib
        devices = None
        dev_spec = getattr(args, "devices", "") if args else ""
        if dev_spec:
            from rgbx_semantic_segmentation_tpu.utils.fs import parse_devices
            all_devices = jax.devices()
            devices = [all_devices[i] for i in parse_devices(dev_spec)]
        mesh_spec = (getattr(args, "mesh", "") if args else "") or "dp"
        try:
            self.mesh = mesh_lib.make_mesh_from_spec(
                mesh_spec, cfg.train.batch_size, devices=devices)
        except ValueError as e:
            raise SystemExit(f"error: {e}")
        ckpt_dir = os.path.join(cfg.log_dir, cfg.tag(), "checkpoint")
        self.checkpoints = CheckpointManager(ckpt_dir)
        self._profile_dir = getattr(args, "profile_dir", None) if args else None

    # -- lifecycle ---------------------------------------------------------
    def __enter__(self):
        self.logger.info("Engine start: %d device(s), mesh %s",
                         jax.device_count(), dict(self.mesh.shape))
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc is not None:
            self.logger.error("run failed: %s", exc)
        self.checkpoints.close()
        return False

    # -- checkpointing -----------------------------------------------------
    def save_checkpoint_if_due(self, epoch: int, state) -> bool:
        if should_checkpoint(self.cfg, epoch):
            t0 = time.time()
            # Async: blocks only for the device->host snapshot copy; the disk
            # commit overlaps the next epoch (drained at close/restore/drain).
            self.checkpoints.save(epoch, state)
            self.logger.info("checkpoint epoch %d dispatched in %.1fs (async "
                             "commit)", epoch, time.time() - t0)
            return True
        return False

    def restore_checkpoint(self, state):
        """Resume from the latest checkpoint (reference engine.py:129-150)."""
        state, next_epoch = self.checkpoints.restore(state)
        self.logger.info("resumed at epoch %d", next_epoch)
        return state, next_epoch

    # -- preemption handling (new subsystem; reference has none, SURVEY §5:
    #    "Failure detection / elastic recovery: none ... Recovery is manual") --
    def install_preemption_handler(self):
        """On SIGTERM/SIGINT, request a graceful stop — TPU preemptions give a
        grace window; the reference loses all progress since the last cadence
        checkpoint (engine.py:157-163 just logs and exits).

        The handler only records the signal (running Orbax save inside a signal
        handler is re-entrancy-unsafe: a signal landing mid-save would leave the
        manager state undefined); the train loop polls `preempted` each
        iteration and calls `drain_preemption` to save from normal context."""
        import signal

        def handler(signum, frame):
            self._preempt_signum = signum
            self.logger.warning(
                "signal %d: preemption checkpoint queued (will save from the "
                "train loop)", signum)

        self._preempt_signum = None
        for sig in (signal.SIGTERM, signal.SIGINT):
            signal.signal(sig, handler)

    @property
    def preempted(self) -> bool:
        return getattr(self, "_preempt_signum", None) is not None

    def drain_preemption(self, epoch: int, state, reraise: bool = True) -> bool:
        """If a stop signal arrived, checkpoint `state` and (by default) re-raise
        the signal with its default disposition so the process exits with the
        conventional status. Returns True when a preemption was handled."""
        import signal

        signum = getattr(self, "_preempt_signum", None)
        if signum is None:
            return False
        self.logger.warning(
            "signal %d: writing preemption checkpoint (epoch %d)", signum, epoch)
        # block=True: the process exits right after — the write must be durable.
        self.checkpoints.save(max(epoch, 0), state, block=True)
        self._preempt_signum = None
        if reraise:
            signal.signal(signum, signal.SIG_DFL)
            signal.raise_signal(signum)
        return True

    # -- profiling (new subsystem; reference has none, SURVEY §5) -----------
    @contextlib.contextmanager
    def profile(self, name: str = "train") -> Iterator[None]:
        if not self._profile_dir:
            yield
            return
        path = os.path.join(self._profile_dir, name)
        jax.profiler.start_trace(path)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
            self.logger.info("profiler trace written to %s", path)

    @contextlib.contextmanager
    def step_trace(self, name: str, step: int) -> Iterator[None]:
        with jax.profiler.StepTraceAnnotation(name, step_num=step):
            yield
