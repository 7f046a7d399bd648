"""rgbx_semantic_segmentation_tpu: TPU-native RGB-X semantic segmentation.

A from-scratch JAX/XLA/Pallas rebuild of the CMX RGB-X segmentation stack
(reference: ynalcakan/RGBX_Semantic_Segmentation): dual-branch transformer
encoders fusing RGB with a second modality through per-stage FRM/FFM
cross-attention, a family of decode heads and losses, data-parallel training
over a device mesh, and sliding-window multi-scale/flip evaluation.

See SURVEY.md for the reference structural analysis this build targets.
"""

from rgbx_semantic_segmentation_tpu.config import (  # noqa: F401
    Config, DatasetConfig, EvalConfig, ModelConfig, TrainConfig, get_config,
    mfnet_config, nyu_config, pst900_config)

__version__ = "0.1.0"

__all__ = [
    "Config", "DatasetConfig", "ModelConfig", "TrainConfig", "EvalConfig",
    "get_config", "mfnet_config", "pst900_config", "nyu_config",
]
