"""Sharding-constraint helpers for model internals.

Under the 2-D (data x spatial) mesh (parallel/mesh.make_mesh_2d), GSPMD must
propagate shardings through the attention reshapes (B,H,W,C) <-> (B,N,C) <->
(B,h,N,d). Without annotations it occasionally gives up and emits
"[SPMD] Involuntary full rematerialization" (replicate-then-reshard) on the
backward-pass reshapes. `constrain` pins the intended layout — batch on 'data',
tokens/height on 'spatial', kv heads replicated — at the few reshape points
that matter, so the partitioner never has to guess.

The helper is mesh-context aware: axis names that are not part of the mesh
active at trace time are dropped, and with no mesh at all it is a no-op — the
same model code runs unsharded, 1-D data-parallel, and 2-D data x spatial.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import PartitionSpec


def _active_mesh():
    """The mesh installed by `with mesh:` / `use_mesh` around the jit call
    (trace-time)."""
    try:  # explicit-sharding mode (jax.sharding.use_mesh / set_mesh)
        am = jax.sharding.get_abstract_mesh()
        if am is not None and not am.empty:
            return am
    except Exception:
        pass
    try:  # legacy `with mesh:` context (deprecated in jax 0.8.2 but live)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            from jax.interpreters import pxla
            mesh = pxla.thread_resources.env.physical_mesh
        return None if mesh.empty else mesh
    except Exception:
        return None


def axis_size(name: str) -> Optional[int]:
    """Size of a mesh axis in the active mesh context, or None if absent.
    Lets callers gate constraints on layout divisibility (e.g. token-grid rows
    % 'spatial') that the per-dim guard in `constrain` cannot see."""
    mesh = _active_mesh()
    if mesh is None or name not in mesh.axis_names:
        return None
    return mesh.shape[name]


def constrain(x, *axes: Optional[str]):
    """with_sharding_constraint(x, P(*axes)), keeping only axis names present
    in the active mesh; no-op without a mesh context. Trailing dims of x
    beyond len(axes) stay unconstrained (None)."""
    mesh = _active_mesh()
    if mesh is None:
        return x
    names = set(mesh.axis_names)
    cleaned = []
    for dim, a in enumerate(axes):
        # Drop axis names missing from the mesh, and any whose size does not
        # divide the dim (e.g. the batch-1 init trace, or tiny token counts).
        if a is None or a not in names or x.shape[dim] % mesh.shape[a] != 0:
            cleaned.append(None)
        else:
            cleaned.append(a)
    if all(c is None for c in cleaned):
        return x
    return jax.lax.with_sharding_constraint(x, PartitionSpec(*cleaned))
