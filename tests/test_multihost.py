"""Contract tests for parallel/multihost.py (VERDICT r1 #9): per-host batch
slice arithmetic and global-array assembly shapes/sharding on the CPU mesh.
Replaces the reference's DistributedSampler split (dataloader.py:153-156)."""
import numpy as np
import pytest
import jax

from rgbx_semantic_segmentation_tpu.parallel import multihost
from rgbx_semantic_segmentation_tpu.parallel.mesh import (
    DATA_AXIS, batch_sharding, make_mesh)


def test_process_batch_slice_partitions_evenly(monkeypatch):
    """4 simulated hosts x global batch 32: slices are disjoint, ordered, and
    cover [0, 32)."""
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    covered = []
    for idx in range(4):
        monkeypatch.setattr(jax, "process_index", lambda i=idx: i)
        s = multihost.process_batch_slice(32)
        assert s.stop - s.start == 8
        covered.extend(range(s.start, s.stop))
    assert covered == list(range(32))


def test_process_batch_slice_requires_divisibility(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    with pytest.raises(AssertionError):
        multihost.process_batch_slice(32)


def test_make_global_batch_single_host_shapes_and_sharding():
    """Single-process path: arrays come back globally shaped and sharded on
    the 'data' axis across the 8 virtual devices."""
    mesh = make_mesh()
    n = mesh.devices.size
    batch = {
        "rgb": np.random.RandomState(0).randn(n * 2, 4, 4, 3).astype(np.float32),
        "label": np.zeros((n * 2, 4, 4), np.int32),
    }
    out = multihost.make_global_batch(mesh, batch)
    assert out["rgb"].shape == (n * 2, 4, 4, 3)
    assert out["label"].shape == (n * 2, 4, 4)
    for leaf in out.values():
        spec = leaf.sharding.spec
        assert spec[0] == DATA_AXIS
        # each device holds global/n rows
        shard_shape = leaf.sharding.shard_shape(leaf.shape)
        assert shard_shape[0] == leaf.shape[0] // n
    np.testing.assert_array_equal(np.asarray(out["rgb"]), batch["rgb"])


def test_make_global_batch_matches_batch_sharding():
    mesh = make_mesh()
    x = np.arange(mesh.devices.size * 3, dtype=np.float32).reshape(-1, 1)
    out = multihost.make_global_batch(mesh, {"x": x})
    expect = jax.device_put(x, batch_sharding(mesh))
    assert out["x"].sharding.is_equivalent_to(expect.sharding, x.ndim)
    np.testing.assert_array_equal(np.asarray(out["x"]), np.asarray(expect))
