"""PyTorch state_dict -> Flax variables converter.

Because every module in this framework names its submodules after the reference's
torch attribute paths (sequential indices fused: `mlp.0` -> `mlp_0`), a single
generic key/layout transform converts any reference checkpoint:

  - Linear weight (out, in)        -> kernel (in, out)
  - Conv2d weight (O, I/g, kh, kw) -> kernel (kh, kw, I/g, O)   [OIHW -> HWIO]
  - LayerNorm/BatchNorm weight     -> scale
  - BatchNorm running_mean/var     -> batch_stats mean/var
  - bare nn.Parameter scalars      -> same-named leaf

This replaces the reference's `load_dualpath_model` (dual_segformer.py:449-480):
`duplicate_dual_path` performs the same single-tower -> dual-tower key rewriting
(patch_embed -> extra_patch_embed etc.), and `merge_variables` gives
load_state_dict(strict=False) semantics (FRM/FFM stay at init).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

FlaxVariables = Dict[str, Any]

_BN_STATS = {"running_mean": "mean", "running_var": "var"}


def torch_key_to_path(key: str) -> Tuple[str, ...]:
    """'block1.0.attn.q.weight' -> ('block1_0', 'attn', 'q', 'weight')."""
    parts = key.split(".")
    merged = []
    for p in parts:
        if p.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    return tuple(merged)


# Non-parameter torch buffers recomputed statically in this framework.
_SKIP_BUFFERS = {"num_batches_tracked", "relative_position_index", "attn_mask"}


def _convert_leaf(name: str, value: np.ndarray):
    """Returns (collection, new_name, new_value) or None to skip."""
    if name in _SKIP_BUFFERS:
        return None
    if name in _BN_STATS:
        return "batch_stats", _BN_STATS[name], value
    if name == "weight":
        if value.ndim == 4:  # conv OIHW -> HWIO
            return "params", "kernel", value.transpose(2, 3, 1, 0)
        if value.ndim == 2:  # linear (out, in) -> (in, out)
            return "params", "kernel", value.T
        if value.ndim == 1:  # norm scale
            return "params", "scale", value
        raise ValueError(f"unhandled weight ndim {value.ndim}")
    if name == "bias":
        return "params", "bias", value
    if name.startswith("absolute_pos_embed") and value.ndim == 4:
        # Swin APE: torch stores (1, C, h, w) (dual_swin.py:509-513); this
        # framework is NHWC throughout -> (1, h, w, C).
        return "params", name, value.transpose(0, 2, 3, 1)
    # bare nn.Parameter leaves (e.g. IFRM lambda_channel, net_utils.py:162-163)
    return "params", name, value


def _insert(tree: dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_to_flax_variables(state_dict: Mapping[str, Any]) -> FlaxVariables:
    """Convert a flat torch state_dict (tensors or numpy arrays) to nested flax
    variable collections {'params': ..., 'batch_stats': ...}."""
    out: FlaxVariables = {"params": {}, "batch_stats": {}}
    for key, val in state_dict.items():
        # np.array(copy=True): tensor.numpy() VIEWS the torch storage, and on
        # the CPU backend jnp.asarray keeps that buffer zero-copy — a live
        # torch model would then mutate our params/batch_stats in place
        # (optimizer.step(), BN running-stats updates). Copy at the boundary.
        arr = np.array(getattr(val, "detach", lambda: val)().cpu().numpy()
                       if hasattr(val, "detach") else val, copy=True)
        path = torch_key_to_path(key)
        leaf = _convert_leaf(path[-1], arr)
        if leaf is None:
            continue
        collection, new_name, new_val = leaf
        _insert(out[collection], path[:-1] + (new_name,), new_val)
    if not out["batch_stats"]:
        del out["batch_stats"]
    return out


def duplicate_dual_path(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Single-tower SegFormer checkpoint -> dual-tower key space, replicating
    reference `load_dualpath_model` (dual_segformer.py:460-470): every
    patch_embed/block/norm entry is duplicated under the extra_* prefix."""
    out: Dict[str, Any] = {}
    for k, v in state_dict.items():
        if "patch_embed" in k:
            out[k] = v
            out[k.replace("patch_embed", "extra_patch_embed")] = v
        elif "block" in k:
            out[k] = v
            out[k.replace("block", "extra_block")] = v
        elif "norm" in k:
            out[k] = v
            out[k.replace("norm", "extra_norm")] = v
        else:
            out[k] = v
    return out


def duplicate_dual_path_swin(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Single-tower Swin checkpoint -> dual-tower key space, replicating
    reference dual_swin.load_dualpath_model (dual_swin.py:699-737): pulls
    layers.i.downsample.* out into downsamples.i.*, then duplicates each entry
    under the _d tower."""
    out: Dict[str, Any] = {}
    for k, v in state_dict.items():
        if k.startswith("absolute_pos_embed"):
            # QUIRK FIXED: the reference duplicator has no catch-all branch, so
            # a pretrained APE is silently DROPPED (stays at random init even
            # with ape=True); here it loads into both towers.
            out[k] = v
            out["absolute_pos_embed_d"] = v
        elif "downsample" in k and "layer" in k:
            name = k.replace("downsample.", "").replace("layers", "downsamples")
            out[name] = v
            out[name.replace("downsamples", "downsamples_d")] = v
        elif "patch_embed" in k:
            out[k] = v
            out[k.replace("patch_embed", "patch_embed_d")] = v
        elif "layer" in k:
            out[k] = v
            out[k.replace("layers", "layers_d")] = v
        elif "norm" in k:
            out[k] = v
            out[k.replace("norm", "norm_d")] = v
        else:
            out[k] = v
    return out


def duplicate_dual_path_resnet(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """torchvision ResNet checkpoint -> dual-tower key space (reference
    dual_resnet.load_dualpath_model, dual_resnet.py:102-138). Accepts either
    bare torchvision keys (conv1.weight, ...) or backbone.-prefixed ones; the
    fc head is dropped (reference strips it, dual_resnet.py:39-40)."""
    out: Dict[str, Any] = {}
    for k, v in state_dict.items():
        if k.startswith("fc.") or ".fc." in k:
            continue
        key = k if k.startswith("backbone.") else "backbone." + k
        out[key] = v
        out[key.replace("backbone.", "backbone_d.")] = v
    return out


def merge_variables(init_vars: FlaxVariables, loaded: FlaxVariables,
                    strict: bool = False) -> FlaxVariables:
    """Overlay loaded variables onto an init tree: load_state_dict(strict=False)
    semantics — keys present in both are replaced (with shape check), keys only
    in init stay at init, keys only in `loaded` are reported/raised."""
    import jax

    def _merge(init_node, loaded_node, path):
        if not isinstance(loaded_node, dict):
            init_arr = init_node
            if hasattr(init_arr, "shape") and tuple(init_arr.shape) != tuple(
                    np.shape(loaded_node)):
                raise ValueError(
                    f"shape mismatch at {'/'.join(path)}: "
                    f"init {init_arr.shape} vs loaded {np.shape(loaded_node)}")
            return jax.numpy.asarray(loaded_node, dtype=init_arr.dtype)
        out = dict(init_node)
        for k, v in loaded_node.items():
            if k not in init_node:
                if strict:
                    raise KeyError(f"unexpected key {'/'.join(path + (k,))}")
                continue
            out[k] = _merge(init_node[k], v, path + (k,))
        return out

    merged = dict(init_vars)
    for coll, tree in loaded.items():
        if coll in init_vars:
            merged[coll] = _merge(init_vars[coll], tree, (coll,))
        elif strict:
            raise KeyError(f"unexpected collection {coll}")
    return merged


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth checkpoint into numpy without CUDA (reference loads with
    map_location='cpu', dual_segformer.py:453)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "model" in raw:
        raw = raw["model"]
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    # copy=True: .numpy() views torch storage (see torch_to_flax_variables).
    return {k: np.array(v.detach().cpu().numpy(), copy=True)
            for k, v in raw.items()}


def duplicate_dual_path_segnext(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """SegNeXt single-tower -> dual-tower (reference dual_segnext.py:358-387
    semantics, adapted to this framework's working stage/downsample naming)."""
    out: Dict[str, Any] = {}
    for k, v in state_dict.items():
        for prefix in ("stem", "stages", "downsample", "norm"):
            if k.startswith(prefix):
                out[k] = v
                out["extra_" + k] = v
                break
        else:
            out[k] = v
    return out


_DUPLICATORS = {
    "mit": duplicate_dual_path,
    "swin": duplicate_dual_path_swin,
    "resnet": duplicate_dual_path_resnet,
    "segnext": duplicate_dual_path_segnext,
}


def family_for_backbone(backbone: str) -> str:
    """Map a backbone registry name to its pretrained-checkpoint family
    (which duplicator understands the single-tower key space). Used by
    train_cli's --pretrained dispatch."""
    for family in ("swin", "resnet", "segnext"):
        if backbone.startswith(family):
            return family
    return "mit"


def missing_leaves(init_vars: FlaxVariables, loaded: FlaxVariables):
    """Paths of init leaves NOT covered by `loaded` — merge_variables would
    silently leave these at their init values."""
    missing = []

    def walk(init_node, loaded_node, path):
        for k, v in init_node.items():
            ln = loaded_node.get(k) if isinstance(loaded_node, dict) else None
            if isinstance(v, dict):
                walk(v, ln if isinstance(ln, dict) else {}, path + (k,))
            elif ln is None:
                missing.append("/".join(path + (k,)))

    for coll, tree in init_vars.items():
        walk(tree, loaded.get(coll, {}), (coll,))
    return missing


def load_full_model_checkpoint(path: str,
                               init_vars: FlaxVariables) -> FlaxVariables:
    """A TRAINED reference EncoderDecoder .pth -> complete flax variables
    (params + batch_stats), for evaluating reference-trained models here
    (eval_cli -e model.pth). Unlike load_dualpath_pretrained (backbone-only,
    strict=False), EVERY model leaf must be covered by the checkpoint — a key
    the converter failed to map would otherwise silently evaluate at its init
    value. Strips a DDP 'module.' prefix if present (the reference's own
    save strips it, engine/engine.py:92-96; checkpoints saved by plain
    torch.save(model.state_dict()) keep it)."""
    sd = load_torch_checkpoint(path)
    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in sd.items()}
    loaded = torch_to_flax_variables(sd)
    miss = missing_leaves(init_vars, loaded)
    if miss:
        preview = ", ".join(miss[:8]) + ("..." if len(miss) > 8 else "")
        raise KeyError(
            f"{len(miss)} model leaves missing from {path}: {preview} — "
            f"check --backbone/--decoder match the checkpoint's config")
    return merge_variables(init_vars, loaded, strict=True)


def load_dualpath_pretrained(path: str, init_vars: FlaxVariables,
                             backbone_scope: str = "backbone",
                             family: str = "mit") -> FlaxVariables:
    """Full pretrained-backbone load pipeline:
    .pth -> dual-path duplication -> flax layout -> merge under the backbone
    scope with strict=False semantics (FRM/FFM stay at init)."""
    dup = _DUPLICATORS[family]
    sd = dup(load_torch_checkpoint(path))
    flax_vars = torch_to_flax_variables(sd)
    scoped = {
        coll: {backbone_scope: tree} for coll, tree in flax_vars.items()
    }
    return merge_variables(init_vars, scoped)
