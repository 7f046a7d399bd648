"""Learning-rate schedules as optax-compatible scalar schedules.

Parity targets: the 7 schedule classes in reference `utils/lr_policy.py:19-107`.
Each factory returns a callable `step -> lr` usable with
`optax.inject_hyperparams` / `optax.scale_by_schedule`, so the scheduled lr lives
inside the jitted update (no per-iteration host poke into param groups like the
reference's train.py:203-207).

Note: the reference applies the scheduled lr *after* `optimizer.step()`, so each
reference step uses the previous iteration's lr (a one-step lag,
reference train.py:201-207). We apply the lr at the current step — documented
deviation; the lag is a bug, not a feature.
"""
from __future__ import annotations

import math
from typing import Callable, Sequence, Tuple

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def poly_lr(start_lr: float, lr_power: float, total_iters: int) -> Schedule:
    """Reference utils/lr_policy.py:19-27."""
    total = float(total_iters)

    def schedule(step):
        frac = 1.0 - jnp.asarray(step, jnp.float32) / total
        return start_lr * jnp.maximum(frac, 0.0) ** lr_power

    return schedule


def warmup_poly_lr(start_lr: float, lr_power: float, total_iters: int,
                   warmup_steps: int) -> Schedule:
    """Linear warmup then poly decay (reference utils/lr_policy.py:30-42).

    The primary schedule: warmup over `warm_up_epoch * niters_per_epoch` steps then
    `lr * (1 - it/total)^0.9`.
    """
    total = float(total_iters)
    warm = float(warmup_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm_lr = start_lr * (step / warm) if warm > 0 else jnp.asarray(start_lr)
        frac = jnp.maximum(1.0 - step / total, 0.0)
        decay_lr = start_lr * frac ** lr_power
        return jnp.where(step < warm, warm_lr, decay_lr)

    return schedule


def multi_stage_lr(lr_stages: Sequence[Tuple[int, float]]) -> Schedule:
    """Piecewise-constant by epoch boundary (reference utils/lr_policy.py:45-54).

    `lr_stages` is [(boundary_epoch, lr), ...]; returns the lr of the first stage
    whose boundary exceeds the current epoch.
    """
    assert len(lr_stages) > 0 and len(lr_stages[0]) == 2, \
        "lr_stages must be [(iters, lr), ...]"
    boundaries = jnp.asarray([b for b, _ in lr_stages], jnp.float32)
    lrs = jnp.asarray([lr for _, lr in lr_stages], jnp.float32)

    def schedule(epoch):
        epoch = jnp.asarray(epoch, jnp.float32)
        idx = jnp.sum(epoch >= boundaries)  # first stage with epoch < boundary
        idx = jnp.clip(idx, 0, len(lr_stages) - 1)
        return lrs[idx]

    return schedule


def linear_increase_lr(start_lr: float, end_lr: float, warm_iters: int) -> Schedule:
    """Reference utils/lr_policy.py:57-65."""
    delta = (end_lr - start_lr) / warm_iters

    def schedule(step):
        return start_lr + jnp.asarray(step, jnp.float32) * delta

    return schedule


def cyclic_lr(min_lr: float, max_lr: float, cycle_epochs: int, warmup_epochs: int,
              total_iters: int, iters_per_epoch: int,
              min_momentum: float = 0.85, max_momentum: float = 0.95):
    """Cosine annealing with warm restarts + inverse momentum schedule
    (reference utils/lr_policy.py:68-97). Returns (lr_schedule, momentum_schedule)
    as two scalar schedules so each can be injected into optax independently."""

    def _cos_progress(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / iters_per_epoch)
        post = epoch - warmup_epochs
        cycle_epoch = jnp.mod(post, cycle_epochs)
        return epoch, jnp.cos(math.pi * cycle_epoch / cycle_epochs)

    def lr_schedule(step):
        step = jnp.asarray(step, jnp.float32)
        epoch, cosp = _cos_progress(step)
        warm_lr = min_lr + (max_lr - min_lr) * (
            step / (warmup_epochs * iters_per_epoch))
        cyc_lr = min_lr + 0.5 * (max_lr - min_lr) * (1.0 + cosp)
        return jnp.where(epoch < warmup_epochs, warm_lr, cyc_lr)

    def momentum_schedule(step):
        _, cosp = _cos_progress(step)
        return max_momentum - 0.5 * (max_momentum - min_momentum) * (1.0 + cosp)

    return lr_schedule, momentum_schedule


def step_lr(start_lr: float, step_size: int, gamma: float) -> Schedule:
    """Reference utils/lr_policy.py:100-107 (keyed by epoch)."""

    def schedule(epoch):
        k = jnp.floor(jnp.asarray(epoch, jnp.float32) / step_size)
        return start_lr * gamma ** k

    return schedule


def _by_epoch(inner: Schedule, iters_per_epoch: int) -> Schedule:
    """Adapt an epoch-keyed reference schedule (MultiStageLR / LinearIncreaseLR /
    StepLR take `cur_epoch`, lr_policy.py:50,63,106) to the step-keyed optax
    convention."""

    def schedule(step):
        return inner(jnp.asarray(step, jnp.float32) // iters_per_epoch)

    return schedule


def build_schedule(name: str, cfg) -> Schedule:
    """Build any of the 7 reference schedules (utils/lr_policy.py:19-107) from a
    `TrainConfig`. For CyclicLR this returns the lr half; the paired momentum
    schedule is wired by optim.build_optimizer via optax.inject_hyperparams."""
    if name == "WarmUpPolyLR":
        return warmup_poly_lr(cfg.lr, cfg.lr_power, cfg.total_iters, cfg.warmup_iters)
    if name == "PolyLR":
        return poly_lr(cfg.lr, cfg.lr_power, cfg.total_iters)
    if name == "MultiStageLR":
        if not cfg.lr_stages:
            raise ValueError("lr_policy=MultiStageLR needs cfg.train.lr_stages "
                             "[(boundary_epoch, lr), ...]")
        return _by_epoch(multi_stage_lr(cfg.lr_stages), cfg.niters_per_epoch)
    if name == "LinearIncreaseLR":
        # Reference keys get_lr by epoch and divides the delta by `warm_iters`;
        # warm_iters is passed nepochs by intent (lr_policy.py:57-65).
        return _by_epoch(linear_increase_lr(cfg.lr, cfg.end_lr, cfg.nepochs),
                         cfg.niters_per_epoch)
    if name == "CyclicLR":
        lr_sched, _ = cyclic_lr(cfg.min_lr, cfg.lr, cfg.cycle_epochs,
                                cfg.warm_up_epoch, cfg.total_iters,
                                cfg.niters_per_epoch)
        return lr_sched
    if name == "StepLR":
        return _by_epoch(step_lr(cfg.lr, cfg.lr_step_size, cfg.lr_gamma),
                         cfg.niters_per_epoch)
    raise KeyError(f"unknown schedule {name!r}")
