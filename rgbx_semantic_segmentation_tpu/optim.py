"""Optimizer construction.

Parity targets: reference train.py:112-135 (AdamW betas .9/.999 wd .01 | SGD+
momentum | LBFGS) and utils/init_func.py:33-58 `group_weight`: weight decay is
applied only to Linear/Conv kernels; biases, all norm parameters, and bare scalar
parameters (IFRM lambdas) are decay-exempt.

The scheduled LR lives inside the optax chain (scale_by_schedule), so the whole
update — including the WarmUpPolyLR evaluation — compiles into the jitted train
step instead of the reference's per-iteration host poke into param groups
(train.py:203-207).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from rgbx_semantic_segmentation_tpu import lr_schedules
from rgbx_semantic_segmentation_tpu.config import Config


def weight_decay_mask(params) -> Any:
    """True (decay) for conv/linear kernels; False for biases/norm scales/scalars
    — matching reference group_weight (init_func.py:33-58)."""

    def is_kernel(path, leaf):
        last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return last == "kernel" and jnp.ndim(leaf) >= 2

    return jax.tree_util.tree_map_with_path(is_kernel, params)


def frozen_mask(cfg: Config, params) -> Any:
    """True for leaves the Swin `frozen_stages` knob freezes (reference
    _freeze_stages, dual_swin.py:585-600): fs>=0 the patch embeds, fs>=1 the
    absolute position embeddings, fs>=2 stages 0..fs-2 of both towers. The
    model already stop_gradients these (zero grads); this mask additionally
    zeroes their optimizer UPDATES, because AdamW weight decay would otherwise
    still shrink frozen params every step. Returns None when nothing is frozen.
    """
    fs = cfg.model.swin_frozen_stages
    if fs < 0 or not cfg.model.backbone.startswith("swin"):
        return None
    frozen_roots = {"patch_embed", "patch_embed_d"}
    if fs >= 1:
        frozen_roots |= {"absolute_pos_embed", "absolute_pos_embed_d"}
    if fs >= 2:
        for i in range(fs - 1):
            frozen_roots |= {f"layers_{i}", f"layers_d_{i}"}

    def is_frozen(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        return (len(keys) >= 2 and keys[0] == "backbone"
                and keys[1] in frozen_roots)

    return jax.tree_util.tree_map_with_path(is_frozen, params)


def build_optimizer(cfg: Config, params) -> optax.GradientTransformation:
    tc = cfg.train
    mask = weight_decay_mask(params)
    name = tc.optimizer
    # The schedule is only consumed by the AdamW / plain-SGD branches: LBFGS
    # ignores it and CyclicLR-SGD builds its own paired lr+momentum schedules,
    # so constructing it eagerly would raise spurious config errors there
    # (e.g. LBFGS + MultiStageLR without lr_stages).
    def schedule():
        return lr_schedules.build_schedule(tc.lr_policy, tc)

    def finish(tx):
        """Zero the updates of frozen leaves (Swin frozen_stages) — grads are
        already zero via stop_gradient; this stops weight decay too."""
        fmask = frozen_mask(cfg, params)
        if fmask is not None:
            tx = optax.chain(tx, optax.masked(optax.set_to_zero(), fmask))
        return tx

    if name == "AdamW":
        # inject_hyperparams makes the *applied* LR readable from opt_state
        # (see applied_lr) — the log reads the source of truth instead of a
        # second, independently-built schedule that could silently diverge.
        return finish(optax.inject_hyperparams(
            optax.adamw, static_args=("mask",))(
            learning_rate=schedule(), b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=tc.weight_decay, mask=mask))
    if name in ("SGDM", "SGD"):
        # reference: SGD(lr, momentum, weight_decay) — decay applied to the same
        # decay group only.
        if tc.lr_policy == "CyclicLR":
            # CyclicLR pairs the cosine lr with an inverse momentum schedule
            # (reference lr_policy.py:68-97; unusable there — get_lr returns a
            # (lr, momentum) tuple the reference train loop would assign to
            # param_groups['lr']). inject_hyperparams re-resolves both
            # schedules inside the jitted update each step.
            lr_sched, mom_sched = lr_schedules.cyclic_lr(
                tc.min_lr, tc.lr, tc.cycle_epochs, tc.warm_up_epoch,
                tc.total_iters, tc.niters_per_epoch)
            return finish(optax.chain(
                optax.add_decayed_weights(tc.weight_decay, mask=mask),
                optax.inject_hyperparams(optax.sgd)(
                    learning_rate=lr_sched, momentum=mom_sched),
            ))
        return finish(optax.chain(
            optax.add_decayed_weights(tc.weight_decay, mask=mask),
            optax.inject_hyperparams(optax.sgd)(
                learning_rate=schedule(), momentum=tc.momentum),
        ))
    if name == "LBFGS":
        # Reference train.py:127-135 constructs torch LBFGS(max_iter=20,
        # line_search_fn=None) but then calls optimizer.step() with no closure
        # (train.py:201), which raises TypeError — the reference LBFGS path
        # never actually ran. Here it works: optax.lbfgs with the zoom
        # linesearch; the train step passes value/grad/value_fn so the
        # linesearch can re-evaluate the loss (see train.make_train_step).
        return finish(optax.lbfgs(learning_rate=tc.lr))
    raise KeyError(f"unknown optimizer {name!r}")


def applied_lr(opt_state):
    """The learning rate the optimizer ACTUALLY applied at its last update,
    read from the inject_hyperparams state inside `opt_state`. Returns None
    when no injected LR exists (LBFGS: constant cfg.train.lr).

    This is the observability source of truth — train_cli logs this instead
    of evaluating a second schedule object that could diverge from the one
    compiled into the update (e.g. CyclicLR's paired lr+momentum injection).
    """
    def find(state):
        hp = getattr(state, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            return hp["learning_rate"]
        if isinstance(state, (tuple, list)):
            for s in state:
                got = find(s)
                if got is not None:
                    return got
        return None

    lr = find(opt_state)
    return None if lr is None else float(jax.device_get(lr))


def is_lbfgs(cfg: Config) -> bool:
    """LBFGS updates need (value, grad, value_fn) plumbed through tx.update —
    flax's apply_gradients cannot do that, so the train step special-cases it."""
    return cfg.train.optimizer == "LBFGS"
