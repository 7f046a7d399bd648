"""Multi-host data feeding helpers.

On a multi-host slice (e.g. v5e-8 pods), each host loads a distinct shard of
the global batch and assembles a global jax.Array without gathering to any
single host — the ICI/DCN collectives only move what the partitioning needs.
This replaces the reference's DistributedSampler + per-rank batch split
(reference dataloader.py:153-156).

Single-host behaviour degrades to a plain device_put, so the same Trainer code
runs everywhere.
"""
from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from rgbx_semantic_segmentation_tpu.parallel.mesh import batch_sharding


def process_batch_slice(global_batch: int) -> slice:
    """The half-open [start, stop) range of the global batch this host loads."""
    n = jax.process_count()
    idx = jax.process_index()
    per = global_batch // n
    assert per * n == global_batch, (
        f"global batch {global_batch} not divisible by {n} hosts")
    return slice(idx * per, (idx + 1) * per)


def make_global_batch(mesh, host_batch: Dict[str, np.ndarray]):
    """Assemble the global sharded batch from this host's local shard.

    host_batch arrays carry only this host's rows (see process_batch_slice);
    the returned jax.Arrays are globally-shaped and sharded on the mesh's
    'data' axis.
    """
    sharding = batch_sharding(mesh)
    n = jax.process_count()
    if n == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), host_batch)

    def to_global(x):
        global_shape = (x.shape[0] * n,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(to_global, host_batch)
