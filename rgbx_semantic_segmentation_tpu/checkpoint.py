"""Orbax checkpointing: save/restore {params, batch_stats, opt_state, step}.

Parity target: reference engine/engine.py:84-150 — `epoch-N.pth` snapshots plus
an `epoch-last.pth` symlink, rank-0 only, and restore that resumes at epoch+1.
Orbax handles the atomic-write/symlink concerns natively (no `os.system('rm -rf')`
races like reference pyt_utils.py:232-245).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


class CheckpointManager:
    """Epoch-keyed checkpoint manager (save cadence applied by the caller, like
    reference train.py:310-318)."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = _abs(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, epoch: int, state, extra: Optional[dict] = None,
             block: bool = False) -> None:
        """Persist model/optimizer state at an epoch boundary (reference
        engine.py:84-126 save_checkpoint).

        Async by default: Orbax copies the arrays to host synchronously (so
        later in-place/donated updates of the device state cannot corrupt the
        snapshot) and commits the write in a background thread — the next
        train steps overlap the disk IO instead of stalling on it (the
        reference's torch.save blocks the loop). `block=True` waits for the
        commit — required before process exit (preemption drains) and used by
        restore/close/listing internally."""
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats if state.batch_stats else {},
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "epoch": np.asarray(epoch),
        }
        if extra:
            payload["extra"] = extra
        self._mgr.save(epoch, args=ocp.args.StandardSave(payload))
        if block:
            self._mgr.wait_until_finished()

    def wait_until_finished(self) -> None:
        """Block until any in-flight async save has committed."""
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def all_epochs(self):
        self._mgr.wait_until_finished()
        return sorted(self._mgr.all_steps())

    def restore(self, state, epoch: Optional[int] = None):
        """Restore into an existing TrainState template; returns
        (state, next_epoch) — resuming at saved epoch + 1 like reference
        engine.py:143."""
        self._mgr.wait_until_finished()  # an in-flight async save may be it
        if epoch is None:
            epoch = self.latest_epoch()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats if state.batch_stats else {},
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "epoch": np.asarray(0),
        }
        restored = self._mgr.restore(
            epoch, args=ocp.args.StandardRestore(template))
        new_state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"]),
        )
        return new_state, int(restored["epoch"]) + 1

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def resolve_checkpoint_spec(spec: str, default_dir: str):
    """Map an `-e` checkpoint spec to (manager, epochs) — the reference's
    flexible `-e` forms (evaluator.py:42-81) minus torch `.pth` paths, which
    callers handle first (they need a config flip for erf GELU parity):

    - an existing epoch-numbered Orbax step dir → that epoch in its parent
    - an existing checkpoint dir → its latest epoch
    - otherwise a spec ('last' | '300' | '250-400' | '250-') parsed against
      `default_dir`'s available epochs.

    Raises SystemExit when nothing matches (CLI context)."""
    from rgbx_semantic_segmentation_tpu.evaluator import parse_epoch_spec

    if os.path.exists(spec):
        path = _abs(spec.rstrip("/"))
        base = os.path.basename(path)
        if base.isdigit():
            mgr = CheckpointManager(os.path.dirname(path))
            epochs = [int(base)]
        else:
            mgr = CheckpointManager(path)
            epochs = [mgr.latest_epoch()]
        if epochs[0] is None:
            raise SystemExit(f"no checkpoints under {path}")
        return mgr, epochs
    mgr = CheckpointManager(default_dir)
    epochs = parse_epoch_spec(spec, mgr.all_epochs())
    if not epochs:
        raise SystemExit(f"no checkpoints matching {spec!r} in {default_dir}")
    return mgr, epochs
