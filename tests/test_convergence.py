"""Training-convergence proofs (VERDICT r1 #3).

1. Real convergence: mit_b0 on structured synthetic data must reach mIoU > 0.9
   through the full loader -> jitted-step -> evaluator pipeline (the r1 e2e bar
   of pixel_acc > 0.3 was near chance).
2. Optimizer-trajectory golden: 20 train steps of this framework vs the
   reference torch loop (identical init weights, batches, constant lr,
   AdamW + group_weight decay masks) — catches lr/decay-mask/BN-momentum/
   optimizer-math drift that forward-only goldens cannot
   (reference train.py:112-207, utils/init_func.py:33-58).
"""
import numpy as np
import pytest
import jax

from rgbx_semantic_segmentation_tpu.config import (
    DatasetConfig, EvalConfig, ModelConfig, TrainConfig, mfnet_config)
from rgbx_semantic_segmentation_tpu import train as train_lib
from rgbx_semantic_segmentation_tpu.data.loader import TrainLoader, ValLoader
from rgbx_semantic_segmentation_tpu.data.synthetic import make_synthetic_dataset
from rgbx_semantic_segmentation_tpu.evaluator import SegEvaluator


def test_synthetic_convergence_miou(tmp_path_factory):
    """Full pipeline on learnable structured labels: mIoU > 0.9."""
    root = tmp_path_factory.mktemp("conv_data")
    # 64x64: class-band boundaries are 1 decoder cell wide relative to 16-row
    # bands — at 32x32 the 1/4-resolution head's blurred boundaries cap mIoU
    # near 0.89 regardless of training (measured), below the 0.9 bar.
    ds = make_synthetic_dataset(str(root), num_train=16, num_val=4,
                                hw=(64, 64), num_classes=4, seed=5)
    cfg = mfnet_config().replace(
        dataset=ds,
        model=ModelConfig(backbone="mit_b0", decoder="MLPDecoder",
                          decoder_embed_dim=64, use_mixed_precision=False,
                          drop_path_rate=0.0),
        train=TrainConfig(batch_size=4, nepochs=20, niters_per_epoch=8,
                          warm_up_epoch=1, lr=1e-3, num_workers=0,
                          train_scale_array=None),
        eval=EvalConfig(eval_scale_array=(1.0,), eval_flip=False,
                        eval_crop_size=(64, 64)),
    )
    loader = TrainLoader(cfg, num_workers=0)
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_train_step(cfg)
    last_losses = []
    for epoch in range(cfg.train.nepochs):
        for batch in loader.epoch(epoch):
            state, metrics = step(state, batch)
        last_losses.append(float(metrics["loss"]))
    assert last_losses[-1] < 0.5, f"loss stuck: {last_losses}"

    val = ValLoader(cfg)
    evaluator = SegEvaluator(cfg, state.apply_fn)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    scores, line = evaluator.evaluate(variables, val.dataset, eval_batch=4)
    assert scores.mean_iou > 0.9, f"mIoU {scores.mean_iou:.3f}\n{line}"


def _nchw(x):
    import torch
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _build_pair(optimizer, lr, wd, nc=5, hw=32):
    """Reference torch model + our model with identical weights/optimizer."""
    import torch

    from tests.conftest import reference_path
    from rgbx_semantic_segmentation_tpu import convert

    reference_path()
    from easydict import EasyDict
    from models.builder import EncoderDecoder as RefModel
    from utils.init_func import group_weight

    torch.manual_seed(0)
    ref_cfg = EasyDict(dict(
        backbone="mit_b0", decoder="MLPDecoder", decoder_embed_dim=64,
        num_classes=nc, pretrained_model=None, bn_eps=1e-3, bn_momentum=0.1))
    tmod = RefModel(cfg=ref_cfg, criterion=None,
                    norm_layer=torch.nn.BatchNorm2d)
    tmod.train()
    # Deterministic trajectory: zero all stochastic regularisers on the torch
    # side (DropPath drop_prob / Dropout p); the JAX config mirrors this.
    for m in tmod.modules():
        if hasattr(m, "drop_prob"):
            m.drop_prob = 0.0
        if isinstance(m, (torch.nn.Dropout, torch.nn.Dropout2d)):
            m.p = 0.0

    # Reference optimizer setup (train.py:112-124 + init_func.py:33-58).
    params_list = group_weight([], tmod, torch.nn.BatchNorm2d, lr)
    if optimizer == "AdamW":
        topt = torch.optim.AdamW(params_list, lr=lr, betas=(0.9, 0.999),
                                 weight_decay=wd)
    else:
        topt = torch.optim.SGD(params_list, lr=lr, momentum=0.9,
                               weight_decay=wd)

    cfg = mfnet_config().replace(
        dataset=DatasetConfig(num_classes=nc, image_height=hw, image_width=hw,
                              class_names=tuple("abcde")),
        model=ModelConfig(backbone="mit_b0", decoder="MLPDecoder",
                          decoder_embed_dim=64, use_mixed_precision=False,
                          drop_path_rate=0.0, decoder_dropout_ratio=0.0,
                          gelu_approximate=False),  # erf parity vs torch
        # PolyLR with power 0 == constant lr (no warmup lag concerns; the
        # reference applies the scheduled lr one step late, train.py:201-207).
        train=TrainConfig(optimizer=optimizer, lr=lr, weight_decay=wd,
                          lr_policy="PolyLR", lr_power=0.0, batch_size=2,
                          nepochs=1, niters_per_epoch=400, warm_up_epoch=0),
    )
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(
        {"params": state.params, "batch_stats": state.batch_stats},
        loaded, strict=True)
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    return tmod, topt, cfg, state


def _batches(n, nc, hw, batch=2, seed=7):
    rng = np.random.RandomState(seed)
    return [{
        "rgb": rng.randn(batch, hw, hw, 3).astype(np.float32),
        "modal_x": rng.randn(batch, hw, hw, 3).astype(np.float32),
        "label": rng.randint(0, nc, size=(batch, hw, hw)).astype(np.int32),
    } for _ in range(n)]


def _flatcat(tree):
    return np.concatenate([np.asarray(l).ravel()
                           for l in jax.tree_util.tree_leaves(tree)])


def test_gradient_parity_vs_torch():
    """Fresh-init gradients of the full model match the reference torch
    backward (magnitude-weighted cosine; catches any forward/backward drift)."""
    import torch
    import torch.nn.functional as F

    from rgbx_semantic_segmentation_tpu import convert

    NC, HW = 5, 32
    tmod, _, cfg, state = _build_pair("AdamW", 1e-4, 0.01, NC, HW)
    b = _batches(1, NC, HW)[0]

    logits = tmod(_nchw(b["rgb"]), _nchw(b["modal_x"]))
    t_loss = F.cross_entropy(logits, torch.from_numpy(b["label"]).long(),
                             ignore_index=255)
    t_loss.backward()
    tgrads = {n: p.grad.detach().clone() for n, p in tmod.named_parameters()
              if p.grad is not None}

    from rgbx_semantic_segmentation_tpu import losses as losses_lib

    def loss_fn(params):
        out = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            b["rgb"], b["modal_x"], True,
            rngs={"droppath": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])[0]
        return losses_lib.cross_entropy_loss(
            out, np.asarray(b["label"]), 255)

    j_loss, j_grads = jax.value_and_grad(loss_fn)(state.params)
    assert float(j_loss) == pytest.approx(float(t_loss), rel=1e-3)

    tg_tree = convert.torch_to_flax_variables(tgrads)["params"]
    dj, dt = _flatcat(j_grads), _flatcat(tg_tree)
    assert dj.shape == dt.shape
    cos = float(dj @ dt / (np.linalg.norm(dj) * np.linalg.norm(dt)))
    rel = float(np.linalg.norm(dj - dt) / np.linalg.norm(dt))
    assert cos > 0.995, f"gradient direction diverged: cos={cos:.5f}"
    assert rel < 0.08, f"gradient magnitude diverged: rel={rel:.4f}"


def test_decay_mask_matches_reference_group_weight():
    """Structural parity: our weight_decay_mask marks exactly the tensors the
    reference's group_weight puts in the decay group (init_func.py:33-58)."""
    import torch

    from rgbx_semantic_segmentation_tpu import convert, optim

    tmod, _, cfg, state = _build_pair("AdamW", 1e-4, 0.01)
    from utils.init_func import group_weight
    groups = group_weight([], tmod, torch.nn.BatchNorm2d, 1e-4)
    decay_ids = {id(p) for p in groups[0]["params"]}
    flags = {name: torch.full_like(p, float(id(p) in decay_ids))
             for name, p in tmod.named_parameters()}
    flag_tree = convert.torch_to_flax_variables(flags)["params"]

    mask = optim.weight_decay_mask(state.params)
    flat_mask = dict(jax.tree_util.tree_leaves_with_path(mask))
    for path, flag_leaf in jax.tree_util.tree_leaves_with_path(flag_tree):
        want = bool(np.asarray(flag_leaf).flat[0])
        got = bool(flat_mask[path])
        assert got == want, (
            f"decay-mask mismatch at {jax.tree_util.keystr(path)}: "
            f"ours={got} reference={want}")


def test_bn_running_stats_golden_vs_torch():
    """Frozen-params BN golden: 5 train-mode forwards on identical weights
    update the BatchNorm running statistics identically on both sides (torch's
    running-var update uses the UNBIASED batch variance — factor N/(N-1);
    see ops/layers.TorchBatchNorm), then eval-mode logits with those stats
    match tightly. Frozen params isolate BN semantics from optimizer
    numerical noise."""
    import torch

    from rgbx_semantic_segmentation_tpu import convert

    NC, HW = 5, 32
    tmod, _, cfg, state = _build_pair("AdamW", 1e-4, 0.01, NC, HW)
    batches = _batches(5, NC, HW, seed=11)
    tmod.train()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    for b in batches:
        with torch.no_grad():  # train-mode forward still updates BN stats
            tmod(_nchw(b["rgb"]), _nchw(b["modal_x"]))
        _, new_vars = state.apply_fn(variables, b["rgb"], b["modal_x"], True,
                                     mutable=["batch_stats"])
        variables = {"params": state.params,
                     "batch_stats": new_vars["batch_stats"]}

    t_stats = convert.torch_to_flax_variables(tmod.state_dict())["batch_stats"]
    flat_j = jax.tree_util.tree_leaves_with_path(variables["batch_stats"])
    flat_t = dict(jax.tree_util.tree_leaves_with_path(t_stats))
    assert len(flat_j) == len(flat_t) and len(flat_j) > 0
    for path, leaf in flat_j:
        # rtol 1e-3: fp32 reduction-order noise accumulates over the 5
        # updates; a semantic drift (momentum direction, biased-vs-unbiased
        # variance — the factor is 2x at this geometry's 1x1 stage-4 maps)
        # shows up orders of magnitude above this.
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_t[path]), rtol=1e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path))

    tmod.eval()
    with torch.no_grad():
        t_logits = tmod(_nchw(batches[0]["rgb"]), _nchw(batches[0]["modal_x"]))
    j_logits = state.apply_fn(variables, batches[0]["rgb"],
                              batches[0]["modal_x"], False)
    t_np = np.transpose(t_logits.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(j_logits), t_np, atol=5e-3)


def test_optimizer_trajectory_golden_vs_torch():
    """20 identical steps vs the reference torch loop: losses track step for
    step (AdamW), and the SGDM parameter trajectory matches directionally
    (SGD deltas are gradient-proportional, so the comparison is
    magnitude-weighted — AdamW deltas are ~lr*sign(grad), where
    near-zero-gradient coordinates accumulate benign sign noise, so AdamW
    is held to loss tracking only; BN running-stats parity has its own
    frozen-params golden above)."""
    import torch
    import torch.nn.functional as F

    from rgbx_semantic_segmentation_tpu import convert

    NC, HW, N_STEPS = 5, 32, 20

    # ---- AdamW: loss tracking ---------------------------------------------
    tmod, topt, cfg, state = _build_pair("AdamW", 1e-4, 0.01, NC, HW)
    step = train_lib.make_train_step(cfg)
    batches = _batches(N_STEPS, NC, HW)
    t_losses, j_losses = [], []
    for b in batches:
        logits = tmod(_nchw(b["rgb"]), _nchw(b["modal_x"]))
        loss = F.cross_entropy(logits, torch.from_numpy(b["label"]).long(),
                               ignore_index=255)
        topt.zero_grad()
        loss.backward()
        topt.step()
        t_losses.append(float(loss.detach()))
        state, metrics = step(state, b)
        j_losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-2, atol=2e-3)

    # ---- SGDM: parameter-trajectory golden (gradient-proportional) --------
    # 5 steps: per-step gradients agree to cos > 0.995 (gradient-parity test),
    # but trajectory divergence compounds chaotically — once params differ by
    # fp noise, subsequent gradients differ more. 5 steps keeps the compounding
    # small enough that a REAL optimizer-math bug (momentum wiring, decay
    # mask, lr) still separates by an order of magnitude from the fp floor.
    tmod2, topt2, cfg2, state2 = _build_pair("SGDM", 1e-3, 0.01, NC, HW)
    p_init = jax.tree_util.tree_map(np.asarray, state2.params)
    step2 = train_lib.make_train_step(cfg2)
    for b in batches[:5]:
        logits = tmod2(_nchw(b["rgb"]), _nchw(b["modal_x"]))
        loss = F.cross_entropy(logits, torch.from_numpy(b["label"]).long(),
                               ignore_index=255)
        topt2.zero_grad()
        loss.backward()
        topt2.step()
        state2, _ = step2(state2, b)
    t_final = convert.torch_to_flax_variables(tmod2.state_dict())["params"]
    dj = _flatcat(state2.params) - _flatcat(p_init)
    dt = _flatcat(t_final) - _flatcat(p_init)
    assert np.linalg.norm(dt) > 0, "torch params did not move"
    cos = float(dj @ dt / (np.linalg.norm(dj) * np.linalg.norm(dt)))
    rel = float(np.linalg.norm(dj - dt) / np.linalg.norm(dt))
    assert cos > 0.95, f"SGDM trajectory direction diverged: cos={cos:.4f}"
    assert rel < 0.3, f"SGDM trajectory magnitude diverged: rel={rel:.4f}"
