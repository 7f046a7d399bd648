"""Eval-protocol golden: the reference's OWN torch sliding-window evaluator
(reference engine/evaluator.py:306-432: sliding_eval_rgbX / scale_process_rgbX /
val_func_process_rgbX) vs SegEvaluator(compat_stride_swap=True) on the same
converted random-init mit_b0 — pixel-identical argmax.

The reference swaps the h/w stride and crop-extent indices when computing the
sliding grid (evaluator.py:347-352), so its windows are crop_h wide and crop_w
tall, with possibly-NEGATIVE start indices wrapping through python-slice
semantics and possibly-incomplete canvas coverage. The compat path replicates
all of it so reference-trained checkpoints score identically under the
PUBLISHED protocol; geometry here is chosen to make the swapped grid actually
diverge (non-square crop, image larger than the crop in both dims, and one
image short enough to force the negative-start wrap).
"""
import numpy as np
import pytest
import torch

from tests.conftest import reference_path
from rgbx_semantic_segmentation_tpu import convert

CROP = (32, 48)  # non-square (h, w): the swap diverges from the correct grid
STRIDE_RATE = 2.0 / 3.0


class _CpuValFunc:
    """val_func shim: the reference evaluator calls .eval()/.to(device) and
    then the model; .to(-1) (a CPU tensor's get_device()) is not a valid torch
    device, so it must be absorbed here."""

    def __init__(self, model):
        self._model = model

    def eval(self):
        self._model.eval()

    def to(self, device):
        return self

    def __call__(self, *args):
        return self._model(*args)


@pytest.fixture(scope="module")
def models():
    """(reference torch EncoderDecoder, our SegEvaluator-ready pieces) sharing
    one set of converted random-init mit_b0 weights."""
    import jax  # noqa: F401  (platform forced by conftest)

    reference_path()
    from easydict import EasyDict
    from models.builder import EncoderDecoder as RefModel

    ref_cfg = EasyDict(dict(
        backbone="mit_b0", decoder="MLPDecoder", decoder_embed_dim=64,
        num_classes=9, pretrained_model=None, bn_eps=1e-3, bn_momentum=0.1))
    tmod = RefModel(cfg=ref_cfg, criterion=None,
                    norm_layer=torch.nn.BatchNorm2d)
    tmod.eval()

    from rgbx_semantic_segmentation_tpu.config import (
        DatasetConfig, EvalConfig, ModelConfig, mfnet_config)
    from rgbx_semantic_segmentation_tpu.models.builder import EncoderDecoder

    cfg = mfnet_config().replace(
        dataset=DatasetConfig(num_classes=9, image_height=CROP[0],
                              image_width=CROP[1]),
        model=ModelConfig(backbone="mit_b0", decoder="MLPDecoder",
                          decoder_embed_dim=64, use_mixed_precision=False,
                          gelu_approximate=False),  # erf parity vs torch
        eval=EvalConfig(eval_scale_array=(1.0,), eval_flip=False,
                        eval_crop_size=CROP, eval_stride_rate=STRIDE_RATE),
    )
    fmod = EncoderDecoder(cfg=cfg)
    rng = np.random.RandomState(0)
    rgb0 = rng.randn(1, CROP[0], CROP[1], 3).astype(np.float32)
    variables = fmod.init(jax.random.PRNGKey(0), rgb0, rgb0)
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    return tmod, cfg, fmod, variables


def _ref_evaluator(tmod, monkeypatch):
    """Reference Evaluator wired for CPU: constructor skipped (it builds a
    multiprocessing queue off a dataset), .cuda() made a no-op — the evaluator
    logic under test (engine/evaluator.py:306-432) is untouched."""
    from engine.evaluator import Evaluator as RefEvaluator

    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **kw: self, raising=True)
    ev = object.__new__(RefEvaluator)
    ev.class_num = 9
    ev.norm_mean = np.array([0.485, 0.456, 0.406])
    ev.norm_std = np.array([0.229, 0.224, 0.225])
    ev.multi_scales = [1.0]
    ev.is_flip = False
    ev.val_func = _CpuValFunc(tmod)
    return ev


def _our_evaluator(cfg, fmod, compat: bool):
    from rgbx_semantic_segmentation_tpu.evaluator import SegEvaluator

    return SegEvaluator(cfg, fmod.apply, compat_stride_swap=compat)


@pytest.mark.parametrize("img_hw", [
    (40, 72),   # ph < crop_w: the swapped grid's s_y goes NEGATIVE (wrap)
    (56, 72),   # plain divergent swap: incomplete right-edge coverage
])
def test_stride_swap_matches_reference_evaluator(models, monkeypatch, img_hw):
    tmod, cfg, fmod, variables = models
    ref_ev = _ref_evaluator(tmod, monkeypatch)

    rng = np.random.RandomState(7)
    h, w = img_hw
    img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    modal = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)

    ref_pred = ref_ev.sliding_eval_rgbX(img, modal, CROP, STRIDE_RATE,
                                        device=None)

    ours = _our_evaluator(cfg, fmod, compat=True)
    our_pred = ours.sliding_eval_rgbx(variables, img, modal)

    assert our_pred.shape == ref_pred.shape == (h, w)
    mismatch = (our_pred != ref_pred).mean()
    assert mismatch == 0.0, f"argmax differs on {mismatch:.2%} of pixels"


def test_swapped_grid_actually_diverges(models):
    """The compat grid must differ from the CORRECT grid on this geometry —
    otherwise the golden above would pass vacuously."""
    _, cfg, fmod, variables = models
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(56, 72, 3)).astype(np.uint8)
    modal = rng.randint(0, 256, size=(56, 72, 3)).astype(np.uint8)
    swap = _our_evaluator(cfg, fmod, compat=True).sliding_eval_rgbx(
        variables, img, modal)
    correct = _our_evaluator(cfg, fmod, compat=False).sliding_eval_rgbx(
        variables, img, modal)
    assert (swap != correct).any()
