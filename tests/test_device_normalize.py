"""uint8 device-normalized batches must train identically to fp32 host batches."""
import numpy as np
import pytest
import jax

from rgbx_semantic_segmentation_tpu.config import (
    DatasetConfig, ModelConfig, TrainConfig, mfnet_config)
from rgbx_semantic_segmentation_tpu import train as train_lib
from rgbx_semantic_segmentation_tpu.data import cv_ops


def _cfg():
    return mfnet_config().replace(
        dataset=DatasetConfig(num_classes=5, image_height=32, image_width=32,
                              class_names=tuple("abcde")),
        model=ModelConfig(backbone="mit_b0", decoder="MLPDecoder",
                          decoder_embed_dim=64, use_mixed_precision=False,
                          drop_path_rate=0.0),
        # SGDM, not AdamW: the uint8 and fp32 paths are DIFFERENT XLA
        # programs whose activations agree only to float rounding, and AdamW
        # deltas (~lr*sign(grad)) amplify ulp-level gradient differences into
        # sign flips on near-zero-gradient coordinates. SGDM deltas are
        # gradient-proportional, so ulp-level input agreement stays ulp-level
        # in the params and the tight tolerance is meaningful.
        train=TrainConfig(batch_size=4, warm_up_epoch=0, nepochs=1,
                          niters_per_epoch=4, lr=1e-3, optimizer="SGDM"))


def test_uint8_batch_matches_fp32_batch():
    cfg = _cfg()
    rng = np.random.RandomState(0)
    rgb_u8 = rng.randint(0, 255, (4, 32, 32, 3), np.uint8)
    mx_u8 = rng.randint(0, 255, (4, 32, 32, 3), np.uint8)
    label = rng.randint(0, 5, (4, 32, 32)).astype(np.uint8)

    batch_u8 = {"rgb": rgb_u8, "modal_x": mx_u8, "label": label}
    batch_f32 = {
        "rgb": cv_ops.normalize(rgb_u8.reshape(-1, 32, 3),
                                cfg.dataset.norm_mean,
                                cfg.dataset.norm_std).reshape(4, 32, 32, 3),
        "modal_x": cv_ops.normalize(mx_u8.reshape(-1, 32, 3),
                                    cfg.dataset.norm_mean,
                                    cfg.dataset.norm_std).reshape(4, 32, 32, 3),
        "label": label.astype(np.int32),
    }

    step = train_lib.make_train_step(cfg)
    s_a = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    s_b = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    for _ in range(2):
        s_a, m_a = step(s_a, batch_u8)
        s_b, m_b = step(s_b, batch_f32)
    assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]), rel=1e-4)
    pa = jax.tree_util.tree_leaves(s_a.params)
    pb = jax.tree_util.tree_leaves(s_b.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_loader_emits_uint8_by_default(tmp_path):
    from rgbx_semantic_segmentation_tpu.data.loader import TrainLoader
    from rgbx_semantic_segmentation_tpu.data.synthetic import (
        make_synthetic_dataset)

    ds = make_synthetic_dataset(str(tmp_path), num_train=4, num_val=2,
                                hw=(32, 32), num_classes=4)
    cfg = _cfg().replace(dataset=ds, train=TrainConfig(
        batch_size=2, niters_per_epoch=2, num_workers=0))
    loader = TrainLoader(cfg, num_workers=0)
    batch = next(iter(loader.epoch(0)))
    assert batch["rgb"].dtype == np.uint8
    assert batch["modal_x"].dtype == np.uint8
    assert batch["label"].dtype == np.uint8
    # legacy fp32 host-normalised mode still available
    loader2 = TrainLoader(cfg, num_workers=0, device_normalize=False)
    batch2 = next(iter(loader2.epoch(0)))
    assert batch2["rgb"].dtype == np.float32
