"""Device-side resize matching torch F.interpolate semantics.

torch `F.interpolate(mode='bilinear', align_corners=False)` uses half-pixel
centers with no antialiasing — `jax.image.resize(method='bilinear',
antialias=False)` implements the same convention (verified by golden test vs
torch in tests/test_decoders.py). align_corners=True maps to jax's 'linear' with
explicit scale handling and is not needed by any reference config (all decoders
pass align_corners=False).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear-resize NHWC maps to (H, W). Upsampling is the common case
    (decoder feature alignment, reference MLPDecoder.py:67-73, builder.py:233)."""
    B, H, W, C = x.shape
    if (H, W) == tuple(size):
        return x
    out = jax.image.resize(x.astype(jnp.float32),
                           (B, size[0], size[1], C),
                           method="bilinear", antialias=False)
    return out.astype(x.dtype)


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize for label maps."""
    B, H, W = x.shape[:3]
    if (H, W) == tuple(size):
        return x
    shape = (B, size[0], size[1]) + x.shape[3:]
    return jax.image.resize(x, shape, method="nearest")
