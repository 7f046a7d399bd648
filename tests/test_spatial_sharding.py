"""2-D (data x spatial) sharding: the full train step under GSPMD with the image
height dimension sharded must match the unsharded step (XLA inserts conv halo
exchanges and attention gathers)."""
import numpy as np
import pytest
import jax

from rgbx_semantic_segmentation_tpu.config import (
    DatasetConfig, ModelConfig, TrainConfig, mfnet_config)
from rgbx_semantic_segmentation_tpu import train as train_lib
from rgbx_semantic_segmentation_tpu.parallel import mesh as mesh_lib


def _cfg():
    return mfnet_config().replace(
        dataset=DatasetConfig(num_classes=5, image_height=64, image_width=64,
                              class_names=tuple("abcde")),
        model=ModelConfig(backbone="mit_b0", decoder="MLPDecoder",
                          decoder_embed_dim=64, use_mixed_precision=False,
                          drop_path_rate=0.0),
        train=TrainConfig(batch_size=4, warm_up_epoch=0, nepochs=1,
                          niters_per_epoch=2, lr=1e-3))


def test_2d_sharded_step_matches_unsharded():
    cfg = _cfg()
    step = train_lib.make_train_step(cfg)
    rng = np.random.RandomState(0)
    batch = {"rgb": rng.randn(4, 64, 64, 3).astype(np.float32),
             "modal_x": rng.randn(4, 64, 64, 3).astype(np.float32),
             "label": rng.randint(0, 5, (4, 64, 64)).astype(np.int32)}

    s_ref, m_ref = step(train_lib.create_train_state(
        cfg, jax.random.PRNGKey(0)), batch)

    mesh = mesh_lib.make_mesh_2d(data=2, spatial=4)
    sh = mesh_lib.spatial_batch_sharding(mesh)
    batch_sh = {k: jax.device_put(v, sh) for k, v in batch.items()}
    state2 = mesh_lib.replicate(mesh, train_lib.create_train_state(
        cfg, jax.random.PRNGKey(0)))
    with mesh:  # trace-time context resolves the model's sharding constraints
        s2, m2 = step(state2, batch_sh)

    assert float(m_ref["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    pa = jax.tree_util.tree_leaves(s_ref.params)
    pb = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(pa, pb):
        # fp32 cross-device reduction order differences only
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_2d_sharded_step_with_pallas_interpret_matches(monkeypatch):
    """Same 2-D GSPMD exactness bar, but with the shard_mapped Pallas
    SR-attention kernel active (interpret mode on the CPU mesh) — validates
    the path real multi-chip TPU training takes: batch on 'data', q tokens on
    'spatial' where rows divide, kv replicated, dk/dv psum'd in the backward
    (ops/sr_attention.sr_attention_sharded)."""
    import dataclasses

    monkeypatch.setenv("RGBX_PALLAS_INTERPRET", "1")
    cfg = _cfg()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, use_pallas_kernels=True))
    step = train_lib.make_train_step(cfg)
    rng = np.random.RandomState(1)
    batch = {"rgb": rng.randn(4, 64, 64, 3).astype(np.float32),
             "modal_x": rng.randn(4, 64, 64, 3).astype(np.float32),
             "label": rng.randint(0, 5, (4, 64, 64)).astype(np.int32)}

    monkeypatch.delenv("RGBX_PALLAS_INTERPRET")
    s_ref, m_ref = step(train_lib.create_train_state(
        cfg, jax.random.PRNGKey(0)), batch)  # unsharded -> XLA attention
    monkeypatch.setenv("RGBX_PALLAS_INTERPRET", "1")

    mesh = mesh_lib.make_mesh_2d(data=2, spatial=4)
    sh = mesh_lib.spatial_batch_sharding(mesh)
    batch_sh = {k: jax.device_put(v, sh) for k, v in batch.items()}
    state2 = mesh_lib.replicate(mesh, train_lib.create_train_state(
        cfg, jax.random.PRNGKey(0)))
    with mesh:
        s2, m2 = step(state2, batch_sh)

    assert float(m_ref["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    pa = jax.tree_util.tree_leaves(s_ref.params)
    pb = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_trainer_on_2d_mesh_matches_unsharded():
    """The 2-D layout through the Trainer itself (train_cli --mesh 2d:D,S):
    batch_sharding() routes (B, H, ...) arrays to P('data', 'spatial')."""
    cfg = _cfg()
    rng = np.random.RandomState(1)
    batch = {"rgb": rng.randn(4, 64, 64, 3).astype(np.float32),
             "modal_x": rng.randn(4, 64, 64, 3).astype(np.float32),
             "label": rng.randint(0, 5, (4, 64, 64)).astype(np.int32)}
    step = train_lib.make_train_step(cfg)
    s_ref, m_ref = step(train_lib.create_train_state(
        cfg, jax.random.PRNGKey(cfg.train.seed)), batch)

    trainer = train_lib.Trainer(cfg, mesh=mesh_lib.make_mesh_2d(2, 4))
    m2 = trainer.step(batch)
    assert float(m_ref["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(trainer.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_make_mesh_from_spec():
    m = mesh_lib.make_mesh_from_spec("dp", 8)
    assert m.axis_names == ("data",)
    m = mesh_lib.make_mesh_from_spec("dp:4", 8)
    assert m.shape["data"] == 4
    m = mesh_lib.make_mesh_from_spec("2d:2,4", 8)
    assert dict(m.shape) == {"data": 2, "spatial": 4}
    m = mesh_lib.make_mesh_from_spec("tp:2,4", 8)
    assert dict(m.shape) == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        mesh_lib.make_mesh_from_spec("ring:3", 8)
    with pytest.raises(ValueError):
        mesh_lib.make_mesh_from_spec("2d:banana", 8)
    # dp:N beyond the device count errors like 2d/tp do (regression: it
    # silently truncated to the available devices); dp:0 errors cleanly too.
    n = len(jax.devices())
    with pytest.raises(ValueError, match="bad mesh spec"):
        mesh_lib.make_mesh_from_spec(f"dp:{n + 1}", 8)
    with pytest.raises(ValueError, match="bad mesh spec"):
        mesh_lib.make_mesh_from_spec("dp:0", 8)
