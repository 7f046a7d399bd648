"""Train-step tests on a virtual 8-device CPU mesh: loss decreases, params
update, gradient reduction and BN stats are global across the data axis."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rgbx_semantic_segmentation_tpu.config import mfnet_config, ModelConfig, TrainConfig, DatasetConfig
from rgbx_semantic_segmentation_tpu import train as train_lib
from rgbx_semantic_segmentation_tpu.parallel import mesh as mesh_lib


def tiny_cfg(**model_kw):
    cfg = mfnet_config()
    ds = DatasetConfig(num_classes=5, image_height=32, image_width=32,
                       class_names=tuple("abcde"))
    model = ModelConfig(backbone="mit_b0", decoder="MLPDecoder",
                        decoder_embed_dim=64, use_mixed_precision=False,
                        **model_kw)
    tc = TrainConfig(batch_size=8, nepochs=2, niters_per_epoch=4,
                     warm_up_epoch=1, lr=1e-3)
    return cfg.replace(dataset=ds, model=model, train=tc)


def synthetic_batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    B = cfg.train.batch_size
    H, W = cfg.dataset.image_height, cfg.dataset.image_width
    return {
        "rgb": rng.randn(B, H, W, 3).astype(np.float32),
        "modal_x": rng.randn(B, H, W, 3).astype(np.float32),
        "label": rng.randint(0, cfg.dataset.num_classes,
                             size=(B, H, W)).astype(np.int32),
    }


def test_single_device_train_step_updates_params():
    cfg = tiny_cfg()
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_train_step(cfg)
    batch = synthetic_batch(cfg)
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    # WarmUpPolyLR gives lr=0 at step 0 (reference lr_policy.py:38-39), so the
    # first update is a no-op; check after the second step.
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    state2, metrics = step(state2, batch)
    assert int(state2.step) == 2
    p1 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(p0, np.asarray(p1))


def test_loss_decreases_over_steps():
    cfg = tiny_cfg()
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_train_step(cfg)
    batch = synthetic_batch(cfg)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_mesh_train_matches_single_device():
    """Global-batch gradient semantics: an 8-way sharded step must produce the
    same params as the unsharded step (allreduce = exact global mean)."""
    cfg = tiny_cfg()
    batch = synthetic_batch(cfg, seed=3)

    # Single device; same seed as the Trainer uses -> identical init values.
    state_a = train_lib.create_train_state(
        cfg, jax.random.PRNGKey(cfg.train.seed))
    step_a = train_lib.make_train_step(cfg)
    state_a, m_a = step_a(state_a, batch)

    # 8-device mesh.
    trainer = train_lib.Trainer(cfg, mesh=mesh_lib.make_mesh())
    m_b = trainer.step(batch)

    assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]), rel=1e-4)
    pa = jax.tree_util.tree_leaves(state_a.params)
    pb = jax.tree_util.tree_leaves(trainer.state.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_batch_stats_are_global_across_shards():
    """BN batch stats must equal the global-batch stats (SyncBN parity)."""
    cfg = tiny_cfg()
    batch = synthetic_batch(cfg, seed=4)
    state_a = train_lib.create_train_state(
        cfg, jax.random.PRNGKey(cfg.train.seed))
    step_a = train_lib.make_train_step(cfg)
    state_a, _ = step_a(state_a, batch)

    trainer = train_lib.Trainer(cfg)
    trainer.step(batch)

    sa = jax.tree_util.tree_leaves(state_a.batch_stats)
    sb = jax.tree_util.tree_leaves(trainer.state.batch_stats)
    for a, b in zip(sa, sb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_weight_decay_mask():
    from rgbx_semantic_segmentation_tpu.optim import weight_decay_mask
    params = {
        "dense": {"kernel": jnp.zeros((3, 4)), "bias": jnp.zeros(4)},
        "norm": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
        "frm": {"lambda_channel": jnp.zeros(())},
        "conv": {"kernel": jnp.zeros((3, 3, 2, 4))},
    }
    mask = weight_decay_mask(params)
    assert mask["dense"]["kernel"] and mask["conv"]["kernel"]
    assert not mask["dense"]["bias"]
    assert not mask["norm"]["scale"] and not mask["norm"]["bias"]
    assert not mask["frm"]["lambda_channel"]


def test_eval_step_runs():
    cfg = tiny_cfg()
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    ev = train_lib.make_eval_step(cfg)
    batch = synthetic_batch(cfg)
    logits = ev(state, batch["rgb"], batch["modal_x"])
    assert logits.shape == (8, 32, 32, 5)


def test_ifrm_iffm_train_step():
    cfg = tiny_cfg(feature_rectify_module="IFRM", feature_fusion_module="IFFM")
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_train_step(cfg)
    state, metrics = step(state, synthetic_batch(cfg))
    assert np.isfinite(float(metrics["loss"]))


def test_train_step_seed_override_changes_dropout_stream():
    """make_train_step(seed=...) overrides cfg.train.seed for the
    droppath/dropout RNG (regression: Trainer's seed override changed init
    only, so 'independent' seeded runs shared dropout masks)."""
    cfg = tiny_cfg(drop_path_rate=0.5)
    batch = synthetic_batch(cfg)

    def run(seed):
        # fresh state per run: the jitted step donates its input state
        state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
        return float(train_lib.make_train_step(cfg, seed=seed)(
            state, batch)[1]["loss"])

    loss_a = run(111)
    loss_b = run(222)
    loss_a2 = run(111)
    assert loss_a == loss_a2          # deterministic per seed
    assert loss_a != loss_b           # independent across seeds
