"""Child process for tests/test_multihost.py::test_two_process_distributed —
one controller of a REAL 2-process jax.distributed run on the CPU backend.

Usage: python _multihost_child.py <coordinator_port> <process_id>

Each process owns 2 virtual CPU devices (4 global). It loads ONLY its
process_batch_slice of a deterministic global batch, assembles the global
sharded array via multihost.make_global_batch (the n>1
jax.make_array_from_process_local_data branch — the code replacing the
reference's DistributedSampler + per-rank batch split, reference
dataloader.py:153-156), then runs jitted data-parallel train steps whose
gradient all-reduce crosses the process boundary. Prints one JSON line the
parent asserts on.
"""
import json
import os
import sys


def main():
    port, pid = int(sys.argv[1]), int(sys.argv[2])

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:  # cross-process CPU collectives (newer jax names it explicitly)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert len(jax.local_devices()) == 2

    import numpy as np
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from rgbx_semantic_segmentation_tpu.parallel import multihost
    from rgbx_semantic_segmentation_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh()  # 1-D 'data' mesh over all 4 global devices
    GLOBAL_B = 8
    sl = multihost.process_batch_slice(GLOBAL_B)
    assert sl.stop - sl.start == 4

    # Deterministic GLOBAL data; each host materialises only its slice.
    rng = np.random.RandomState(0)
    full_x = rng.randn(GLOBAL_B, 16).astype(np.float32)
    full_y = rng.randn(GLOBAL_B, 4).astype(np.float32)
    host_batch = {"x": full_x[sl], "y": full_y[sl]}
    batch = multihost.make_global_batch(mesh, host_batch)
    assert batch["x"].shape == (GLOBAL_B, 16)  # globally shaped

    # Minimal data-parallel train step: the gradient mean over the global
    # batch is what jit's all-reduce computes ACROSS THE TWO PROCESSES.
    w = jax.device_put(np.zeros((16, 4), np.float32),
                       mesh_lib.replicated(mesh))

    @jax.jit
    def step(w, batch):
        def loss_fn(w):
            pred = batch["x"] @ w
            return jnp.mean((pred - batch["y"]) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(w)
        return w - 0.1 * g, loss

    with mesh:
        losses = []
        for _ in range(3):
            w, loss = step(w, batch)
            losses.append(float(loss))

    # Reference result computed locally on the FULL batch (pure numpy).
    w_ref = np.zeros((16, 4), np.float32)
    ref_losses = []
    for _ in range(3):
        pred = full_x @ w_ref
        ref_losses.append(float(np.mean((pred - full_y) ** 2)))
        g = 2.0 * full_x.T @ (pred - full_y) / (GLOBAL_B * 4)
        w_ref = w_ref - 0.1 * g
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-5)

    print(json.dumps({"pid": pid, "process_count": jax.process_count(),
                      "losses": losses}), flush=True)


if __name__ == "__main__":
    main()
