"""Tensor parallelism (data x model mesh): the Mix-FFN hidden dim shards on
'model' (megatron-style fc1 column / fc2 row split) and training stays exactly
equivalent to the unsharded step.

Additive beyond the reference's DP-only runtime (SURVEY §2.7); mirrors the
structure of tests/test_train_step.py::test_mesh_train_matches_single_device.
"""
import numpy as np
import pytest
import jax
from jax.sharding import PartitionSpec as P

from rgbx_semantic_segmentation_tpu import train as train_lib
from rgbx_semantic_segmentation_tpu.parallel import mesh as mesh_lib

from tests.test_train_step import synthetic_batch, tiny_cfg


def test_tp_spec_rules():
    m = 4
    spec = mesh_lib._tp_spec

    fc1_k = np.zeros((32, 128))
    assert spec("['params']['b']['mlp']['fc1']['kernel']", fc1_k, m) == \
        P(None, "model")
    assert spec("['params']['b']['mlp']['fc1']['bias']", np.zeros(128), m) == \
        P("model")
    dw_k = np.zeros((3, 3, 1, 128))
    assert spec("['params']['b']['mlp']['dwconv']['dwconv']['kernel']",
                dw_k, m) == P(None, None, None, "model")
    assert spec("['params']['b']['mlp']['fc2']['kernel']",
                np.zeros((128, 32)), m) == P("model", None)
    # fc2 bias adds to the full (all-reduced) output: replicated.
    assert spec("['params']['b']['mlp']['fc2']['bias']", np.zeros(32), m) == P()
    # Attention + norms replicate.
    assert spec("['params']['b']['attn']['q']['kernel']",
                np.zeros((32, 32)), m) == P()
    # Non-divisible hidden stays replicated.
    assert spec("['params']['b']['mlp']['fc1']['kernel']",
                np.zeros((32, 30)), m) == P()
    # Optimizer moments share the param paths -> same split.
    assert spec(".0.mu['params']['b']['mlp']['fc1']['kernel']", fc1_k, m) == \
        P(None, "model")
    # SegNeXt's conv-FFN (ffn_fc1/ffn_dwconv/ffn_fc2) must NOT match: its 1x1
    # conv kernels are 4-D (replicated), so splitting only the biases would
    # break the whole-layer invariant (regression: substring matching).
    assert spec("['params']['b']['ffn_fc1']['bias']", np.zeros(128), m) == P()
    assert spec("['params']['b']['ffn_fc1']['kernel']",
                np.zeros((1, 1, 32, 128)), m) == P()
    assert spec("['params']['b']['ffn_dwconv']['kernel']",
                np.zeros((3, 3, 1, 128)), m) == P()
    assert spec("['params']['b']['ffn_dwconv']['bias']", np.zeros(128), m) == P()


def test_tp_state_placement():
    cfg = tiny_cfg()
    mesh = mesh_lib.make_mesh_dp_tp(2, 4)
    trainer = train_lib.Trainer(cfg, mesh=mesh)
    p = trainer.state.params["backbone"]["block1_0"]["mlp"]
    assert p["fc1"]["kernel"].sharding.spec == P(None, "model")
    assert p["fc2"]["kernel"].sharding.spec == P("model", None)
    q = trainer.state.params["backbone"]["block1_0"]["attn"]["q"]["kernel"]
    assert q.sharding.spec == P()


def test_tp_train_matches_single_device():
    """dp=2 x tp=4 must reproduce the unsharded step exactly (the fc2
    all-reduce and the sharded AdamW update are bit-compatible reductions)."""
    cfg = tiny_cfg()
    batch = synthetic_batch(cfg, seed=5)

    state_a = train_lib.create_train_state(
        cfg, jax.random.PRNGKey(cfg.train.seed))
    step_a = train_lib.make_train_step(cfg)
    state_a, m_a = step_a(state_a, batch)

    trainer = train_lib.Trainer(cfg, mesh=mesh_lib.make_mesh_dp_tp(2, 4))
    m_b = trainer.step(batch)

    assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]), rel=1e-4)
    pa = jax.tree_util.tree_leaves(state_a.params)
    pb = jax.tree_util.tree_leaves(trainer.state.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tp_checkpoint_roundtrip(tmp_path):
    """Orbax save from a TP-sharded state and restore into a fresh TP trainer
    (and into an unsharded state): values survive the resharding."""
    from rgbx_semantic_segmentation_tpu.checkpoint import CheckpointManager

    cfg = tiny_cfg()
    batch = synthetic_batch(cfg, seed=7)
    mesh = mesh_lib.make_mesh_dp_tp(2, 4)
    trainer = train_lib.Trainer(cfg, mesh=mesh)
    trainer.step(batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, trainer.state)
    mgr.close()

    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    fresh = train_lib.Trainer(cfg, mesh=mesh_lib.make_mesh_dp_tp(2, 4))
    restored, next_epoch = mgr2.restore(fresh.state)
    assert next_epoch == 2
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # Restore into an unsharded single-device state too (tp -> dp portability).
    plain = train_lib.create_train_state(cfg, jax.random.PRNGKey(9))
    restored2, _ = mgr2.restore(plain)
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(restored2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    mgr2.close()
