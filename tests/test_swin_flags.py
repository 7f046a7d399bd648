"""Swin tower flags: APE, frozen_stages, remat (reference dual_swin.py:462-483).

- APE: forward golden vs the reference with ape=True, including the bicubic
  interpolation of the stored grid to a different runtime token grid
  (reference dual_swin.py:631-635).
- frozen_stages: frozen-prefix grads are EXACTLY zero (stop_gradient) and the
  optimizer's updates for frozen leaves are exactly zero even under AdamW
  weight decay (optim.frozen_mask).
- remat: jax.checkpoint'ed blocks are numerically identical forward/backward.
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from tests.conftest import reference_path
from rgbx_semantic_segmentation_tpu import convert


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


_TINY = dict(embed_dim=32, depths=(2, 2), num_heads=(2, 4), window_size=7)


def _tiny_pair(ape=False, frozen_stages=-1):
    """Matched (reference torch, ours) tiny dual-Swin modules."""
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_swin import (
        DualSwinTransformer)
    reference_path()
    from models.encoders.dual_swin import DualSwinTransformer as RefSwin

    tmod = RefSwin(pretrain_img_size=64, patch_size=4, in_chans=3,
                   embed_dim=32, depths=[2, 2], num_heads=[2, 4],
                   window_size=7, drop_path_rate=0.0, out_indices=(0, 1),
                   ape=ape, frozen_stages=frozen_stages)
    tmod.eval()
    fmod = DualSwinTransformer(
        **_TINY, drop_path_rate=0.0, out_indices=(0, 1),
        pretrain_img_size=64, ape=ape, frozen_stages=frozen_stages)
    return tmod, fmod


def test_swin_ape_forward_golden():
    """ape=True full-tower golden: the 16x16 stored APE grid is bicubic-resized
    to the 14x14 runtime token grid (56/4), exercising the a=-0.75 torch cubic
    kernel in ops/resize.resize_bicubic_torch."""
    tmod, fmod = _tiny_pair(ape=True)
    # make the APE non-trivial (torch inits it trunc_normal(std .02); amplify
    # so an interpolation-convention mismatch cannot hide in the tolerance)
    with torch.no_grad():
        tmod.absolute_pos_embed.mul_(50.0)
        tmod.absolute_pos_embed_d.mul_(50.0)
    rng = np.random.RandomState(3)
    rgb = rng.randn(1, 56, 56, 3).astype(np.float32)
    mx = rng.randn(1, 56, 56, 3).astype(np.float32)
    variables = fmod.init(jax.random.PRNGKey(0), rgb, mx)
    assert "absolute_pos_embed" in variables["params"]
    loaded = convert.torch_to_flax_variables(tmod.state_dict())
    variables = convert.merge_variables(variables, loaded, strict=True)
    outs = fmod.apply(variables, rgb, mx)
    with torch.no_grad():
        refs = tmod(_nchw(rgb), _nchw(mx))
    for i, (got, ref) in enumerate(zip(outs, refs)):
        np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=2e-3,
                                   err_msg=f"stage {i}")


def test_bicubic_resize_matches_torch():
    """resize_bicubic_torch vs F.interpolate(mode='bicubic') directly, up- and
    down-sampling, non-square."""
    from rgbx_semantic_segmentation_tpu.ops.resize import resize_bicubic_torch

    rng = np.random.RandomState(0)
    for in_hw, out_hw in [((16, 16), (14, 14)), ((8, 12), (20, 6)),
                          ((7, 7), (7, 9))]:
        x = rng.randn(2, *in_hw, 5).astype(np.float32)
        got = np.asarray(resize_bicubic_torch(jnp.asarray(x), out_hw))
        ref = torch.nn.functional.interpolate(
            _nchw(x), size=out_hw, mode="bicubic", align_corners=False)
        np.testing.assert_allclose(got, _nhwc(ref), atol=1e-5,
                                   err_msg=f"{in_hw}->{out_hw}")


def _grad_tree(fmod, variables, rgb, mx):
    def loss(params):
        outs, _ = fmod.apply({**variables, "params": params}, rgb, mx, True,
                             rngs={"dropout": jax.random.PRNGKey(1),
                                   "droppath": jax.random.PRNGKey(2)},
                             mutable=["batch_stats"])
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    return jax.grad(loss)(variables["params"])


def _max_abs(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return max(float(jnp.max(jnp.abs(l))) for l in leaves) if leaves else 0.0


def test_frozen_stages_zero_grads():
    """frozen_stages=2 freezes patch embeds + APE + stage 0 of BOTH towers
    (reference range(0, fs-1), dual_swin.py:594-600; the reference's
    RGB-only freeze is a documented fixed quirk); stage 1, FRMs and FFMs
    keep nonzero grads."""
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_swin import (
        DualSwinTransformer)

    fmod = DualSwinTransformer(**_TINY, drop_path_rate=0.0,
                               out_indices=(0, 1), pretrain_img_size=64,
                               ape=True, frozen_stages=2)
    rng = np.random.RandomState(5)
    rgb = rng.randn(1, 56, 56, 3).astype(np.float32)
    mx = rng.randn(1, 56, 56, 3).astype(np.float32)
    variables = fmod.init(jax.random.PRNGKey(0), rgb, mx)
    grads = _grad_tree(fmod, variables, rgb, mx)

    frozen = ["patch_embed", "patch_embed_d", "absolute_pos_embed",
              "absolute_pos_embed_d", "layers_0", "layers_d_0"]
    live = ["layers_1", "layers_d_1", "FRMs_0", "FRMs_1", "FFMs_0", "FFMs_1",
            "norm0", "norm1"]
    for name in frozen:
        assert _max_abs(grads[name]) == 0.0, f"{name} grad not zero"
    for name in live:
        assert _max_abs(grads[name]) > 0.0, f"{name} grad unexpectedly zero"


def test_frozen_stages_eval_mode_matches_reference_semantics():
    """With every stage frozen (fs = num_layers + 1) and ape on, NO grad
    reaches the towers; fusion modules still train."""
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_swin import (
        DualSwinTransformer)

    fmod = DualSwinTransformer(**_TINY, drop_path_rate=0.0,
                               out_indices=(0, 1), pretrain_img_size=64,
                               ape=True, frozen_stages=3)
    rng = np.random.RandomState(6)
    rgb = rng.randn(1, 56, 56, 3).astype(np.float32)
    mx = rng.randn(1, 56, 56, 3).astype(np.float32)
    variables = fmod.init(jax.random.PRNGKey(0), rgb, mx)
    grads = _grad_tree(fmod, variables, rgb, mx)
    for name in ["layers_0", "layers_1", "layers_d_0", "layers_d_1",
                 "patch_embed", "patch_embed_d"]:
        assert _max_abs(grads[name]) == 0.0, name
    for name in ["FRMs_0", "FFMs_1"]:
        assert _max_abs(grads[name]) > 0.0, name


def test_frozen_optimizer_updates_zero():
    """AdamW weight decay must not move frozen params: the masked set_to_zero
    in optim.build_optimizer zeroes their final updates."""
    import optax

    from rgbx_semantic_segmentation_tpu import optim
    from rgbx_semantic_segmentation_tpu.config import mfnet_config
    import dataclasses

    cfg = mfnet_config()
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, backbone="swin_s", swin_frozen_stages=2, swin_ape=True),
        # PolyLR: nonzero LR at step 0 (WarmUpPolyLR warms up from 0, which
        # would make EVERY update zero and mask the frozen-leaf check).
        train=dataclasses.replace(cfg.train, lr_policy="PolyLR"))
    params = {
        "backbone": {
            "patch_embed": {"proj": {"kernel": jnp.ones((4, 4, 3, 8)),
                                     "bias": jnp.ones((8,))}},
            "absolute_pos_embed": jnp.ones((1, 4, 4, 8)),
            "layers_0": {"blocks_0": {"mlp": {"fc1": {
                "kernel": jnp.ones((8, 32))}}}},
            "layers_1": {"blocks_0": {"mlp": {"fc1": {
                "kernel": jnp.ones((8, 32))}}}},
            "FRMs_0": {"w": jnp.ones((8,))},
        },
        "decode_head": {"linear_pred": {"kernel": jnp.ones((8, 9))}},
    }
    tx = optim.build_optimizer(cfg, params)
    opt_state = tx.init(params)
    # zero grads everywhere: any nonzero update can only come from weight decay
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    bb = updates["backbone"]
    assert _max_abs(bb["patch_embed"]) == 0.0
    assert _max_abs(bb["absolute_pos_embed"]) == 0.0
    assert _max_abs(bb["layers_0"]) == 0.0
    # weight decay DOES move unfrozen kernels
    assert _max_abs(bb["layers_1"]) > 0.0
    assert _max_abs(updates["decode_head"]) > 0.0


def test_frozen_mask_none_when_off():
    from rgbx_semantic_segmentation_tpu import optim
    from rgbx_semantic_segmentation_tpu.config import mfnet_config

    cfg = mfnet_config()  # mit_b2, frozen_stages=-1
    assert optim.frozen_mask(cfg, {"backbone": {}}) is None


def test_swin_remat_forward_backward_equal():
    """remat=True is numerically identical (forward and grads) to remat=False."""
    from rgbx_semantic_segmentation_tpu.models.encoders.dual_swin import (
        DualSwinTransformer)

    kw = dict(embed_dim=16, depths=(1, 1), num_heads=(1, 2), window_size=7,
              drop_path_rate=0.0, out_indices=(0, 1))
    base = DualSwinTransformer(**kw)
    rem = DualSwinTransformer(**kw, remat=True)
    rng = np.random.RandomState(7)
    rgb = rng.randn(1, 28, 28, 3).astype(np.float32)
    mx = rng.randn(1, 28, 28, 3).astype(np.float32)
    variables = base.init(jax.random.PRNGKey(0), rgb, mx)

    outs_a = base.apply(variables, rgb, mx)
    outs_b = rem.apply(variables, rgb, mx)
    for a, b in zip(outs_a, outs_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ga = _grad_tree(base, variables, rgb, mx)
    gb = _grad_tree(rem, variables, rgb, mx)
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(ga),
            jax.tree_util.tree_leaves_with_path(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)


def test_ape_duplicated_to_both_towers():
    """duplicate_dual_path_swin copies a pretrained APE into both towers (the
    reference duplicator DROPS it — fixed quirk, convert.py)."""
    sd = {"absolute_pos_embed": np.zeros((1, 8, 4, 4)),
          "patch_embed.proj.weight": np.zeros((8, 3, 4, 4))}
    dup = convert.duplicate_dual_path_swin(sd)
    assert "absolute_pos_embed" in dup and "absolute_pos_embed_d" in dup
    flax_vars = convert.torch_to_flax_variables(dup)
    assert flax_vars["params"]["absolute_pos_embed"].shape == (1, 4, 4, 8)
