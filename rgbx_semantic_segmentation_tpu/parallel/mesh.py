"""Device mesh + sharding layout.

Replaces the reference's NCCL/DDP runtime (reference engine/engine.py:56,
train.py:145-146): one `jax.sharding.Mesh` over all chips with the batch sharded
on the 'data' axis and parameters replicated. Under `jit`, XLA inserts the
gradient all-reduces over ICI (and the global BatchNorm reductions — SyncBN
parity) automatically; there is no NCCL-style process zoo.

Three layouts (all beyond the reference's data-parallel-only runtime,
selectable via train_cli --mesh): 1-D 'data' (DP), 2-D data x spatial
(image-height sharding for large images, `make_mesh_2d`), and 2-D
data x model tensor parallelism (megatron-style Mix-FFN/MLP hidden split,
`make_mesh_dp_tp` + `_tp_spec`).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None,
              n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        assert 1 <= n_devices <= len(devices), (
            f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_2d(data: int, spatial: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    """2-D (data x spatial) mesh for large-image scaling: the batch shards on
    'data' and the image height dimension shards on 'spatial'. Under jit,
    GSPMD inserts the halo exchanges for convolutions and the gathers for
    global attention automatically — verified exact against the 1-D layout
    (tests/test_spatial_sharding.py). SURVEY §5 lists this as the additive
    long-context mechanism beyond the reference's data-parallel-only story."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= data * spatial, (
        f"need {data * spatial} devices, have {len(devices)}")
    grid = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, ...) arrays: batch on 'data', height on 'spatial' — the 2-D
    branch of the mesh-aware `batch_sharding` (shared so layout changes apply
    to both entry points)."""
    assert SPATIAL_AXIS in mesh.axis_names, mesh.axis_names
    return batch_sharding(mesh)


def make_mesh_dp_tp(data: int, model: int,
                    devices: Optional[Sequence] = None) -> Mesh:
    """2-D (data x model) mesh: batch sharded on 'data', the transformer MLP
    hidden dimension tensor-split on 'model' (megatron-style column-then-row
    parallel Mix-FFN: fc1 kernel split on its output dim, the depthwise conv
    and GELU local to the shard, fc2 kernel split on its input dim with the
    partial outputs all-reduced by GSPMD). Additive beyond the reference's
    data-parallel-only runtime — lets models whose activations exceed one
    chip's HBM at a given batch train across chips without remat."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= data * model, (
        f"need {data * model} devices, have {len(devices)}")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _tp_spec(path: str, leaf, model: int) -> P:
    """PartitionSpec for one state leaf under tensor parallelism.

    Rules target the Mix-FFN / MLP naming contract (fc1/dwconv/fc2 — both the
    MiT Mix-FFN and the Swin MLP use it, mirroring the reference modules):
      fc1 kernel (C, hidden)       -> split hidden (column parallel)
      fc1 / dwconv bias (hidden,)  -> split
      dwconv kernel (3,3,1,hidden) -> split hidden
      fc2 kernel (hidden, C)       -> split hidden (row parallel; outputs
                                      partial-summed by GSPMD)
    Everything else (attention, convs, norms, fc2 bias, optimizer scalars)
    replicates. Leaves whose hidden dim doesn't divide the model axis stay
    replicated — the same decision falls out for every leaf of one layer
    because they share the hidden dim. Optimizer moments (mu/nu) mirror the
    param tree paths, so the same rules shard them identically."""
    def ok(dim):
        return leaf.shape[dim] % model == 0

    is_kernel = path.endswith("'kernel']")
    is_bias = path.endswith("'bias']")
    # Exact module-key matches: SegNeXt's conv-FFN leaves (ffn_fc1/ffn_dwconv/
    # ffn_fc2, 1x1 CONV kernels) must NOT match — a substring match split
    # their biases while their 4-D kernels stayed replicated, breaking the
    # whole-layer invariant below.
    if "['fc1']" in path:
        if is_kernel and leaf.ndim == 2 and ok(1):
            return P(None, MODEL_AXIS)
        if is_bias and leaf.ndim == 1 and ok(0):
            return P(MODEL_AXIS)
    if "['dwconv']" in path:
        if is_kernel and leaf.ndim == 4 and ok(3):
            return P(None, None, None, MODEL_AXIS)
        if is_bias and leaf.ndim == 1 and ok(0):
            return P(MODEL_AXIS)
    if "['fc2']" in path and is_kernel and leaf.ndim == 2 and ok(0):
        return P(MODEL_AXIS, None)
    return P()


def make_mesh_from_spec(spec: str, batch_size: int,
                        devices: Optional[Sequence] = None) -> Mesh:
    """Mesh from a CLI spec: 'dp' (default: largest batch-dividing data mesh),
    'dp:N', '2d:D,S' (data x spatial), 'tp:D,M' (data x model). The reference
    has no equivalent — its DDP world size is implicit in the launcher."""
    if not spec or spec == "dp":
        return make_mesh_for_batch(batch_size, devices)
    kind, _, dims = spec.partition(":")
    try:
        if kind == "dp":
            return make_mesh(devices, n_devices=int(dims))
        d, m = (int(x) for x in dims.split(","))
        if kind == "2d":
            return make_mesh_2d(d, m, devices)
        if kind == "tp":
            return make_mesh_dp_tp(d, m, devices)
    except (ValueError, AssertionError) as e:
        raise ValueError(f"bad mesh spec {spec!r}: {e}") from e
    raise ValueError(
        f"unknown mesh spec {spec!r} (dp | dp:N | 2d:D,S | tp:D,M)")


def shard_state_tp(mesh: Mesh, tree):
    """Place a train state on a (data x model) mesh per `_tp_spec`."""
    m = mesh.shape[MODEL_AXIS]

    def put(path, x):
        spec = _tp_spec(jax.tree_util.keystr(path), x, m)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, tree)


def make_mesh_for_batch(global_batch: int,
                        devices: Optional[Sequence] = None) -> Mesh:
    """Data mesh over the largest device count that divides the global batch
    (a batch smaller than the slice should not crash small smoke runs)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and global_batch % n != 0:
        n -= 1
    return make_mesh(devices, n_devices=n)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays' layout for this mesh: batch dim on 'data', and — when the
    mesh has a 'spatial' axis — the image height (dim 1 of rgb/modal/label
    alike) on 'spatial'."""
    if SPATIAL_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays, leading dim = global batch) onto the
    mesh, sharded on 'data'. Per-device batch = global // n_devices, matching the
    reference's batch_size // world_size split (dataloader.py:153-156)."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
