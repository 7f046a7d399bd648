"""TPU environment sanity check.

Parity target: reference `utils/check_gpu.py:5-38` (CUDA availability + matmul
smoke test) — TPU-native: device inventory, a synchronized matmul round-trip,
and the virtual-mesh flag check used by the test suite.

Usage:
    python -m rgbx_semantic_segmentation_tpu.tools.check_tpu
"""
from __future__ import annotations

import time


def main():
    import jax
    import jax.numpy as jnp

    devices = jax.devices()
    print(f"backend: {jax.default_backend()}")
    print(f"devices ({len(devices)}):")
    for d in devices:
        print(f"  {d}")

    x = jnp.ones((2048, 2048), jnp.bfloat16)
    f = jax.jit(lambda a: (a @ a).sum())
    out = jax.device_get(f(x))  # forced round-trip (async dispatch otherwise)
    t0 = time.perf_counter()
    out = jax.device_get(f(x))
    dt = time.perf_counter() - t0
    assert float(out) == 2048.0 * 2048 * 2048, "matmul result mismatch"
    print(f"matmul OK ({dt * 1000:.1f} ms round-trip), sum={float(out):.3e}")

    from rgbx_semantic_segmentation_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh()
    print(f"mesh: {dict(mesh.shape)}")


if __name__ == "__main__":
    main()
