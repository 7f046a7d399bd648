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
    # Compute in the input dtype: the decoder's upsample factors are powers of
    # two, whose half-pixel bilinear weights (1/4, 1/8, ... multiples) are
    # exact in bfloat16 — upcasting to fp32 here doubled the resize HBM
    # traffic for no accuracy (goldens run fp32 end-to-end and are unchanged).
    out = jax.image.resize(x, (B, size[0], size[1], C),
                           method="bilinear", antialias=False)
    return out


def resize_bilinear_align_corners(x: jnp.ndarray,
                                  size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with torch align_corners=True semantics
    (src = dst * (in-1)/(out-1)) — used by the DeepLabV3+ head
    (reference deeplabv3plus.py:32,63). Implemented as two static weighted
    gathers; all indices are compile-time constants.
    """
    import numpy as np

    B, H, W, C = x.shape
    oh, ow = size
    if (H, W) == (oh, ow):
        return x

    def idx_w(in_len, out_len):
        if out_len == 1:
            return (np.zeros(1, np.int32), np.zeros(1, np.int32),
                    np.zeros(1, np.float32))
        src = np.arange(out_len) * (in_len - 1) / (out_len - 1)
        lo = np.floor(src).astype(np.int32)
        hi = np.minimum(lo + 1, in_len - 1)
        w = (src - lo).astype(np.float32)
        return lo, hi, w

    y0, y1, wy = idx_w(H, oh)
    x0, x1, wx = idx_w(W, ow)
    xf = x.astype(jnp.float32)
    top = xf[:, y0] * (1.0 - wy)[None, :, None, None] + \
        xf[:, y1] * wy[None, :, None, None]
    out = top[:, :, x0] * (1.0 - wx)[None, None, :, None] + \
        top[:, :, x1] * wx[None, None, :, None]
    return out.astype(x.dtype)


def resize_bicubic_torch(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bicubic resize with torch F.interpolate(mode='bicubic',
    align_corners=False) semantics: cubic convolution kernel with a=-0.75
    (torch's choice; jax.image.resize uses Keys a=-0.5, which diverges),
    half-pixel centers, border taps clamped. Used by the Swin absolute
    position embedding (reference dual_swin.py:631-635).

    Separable implementation: two static (out, in) interpolation matrices
    contracted over H then W — exact, and far cheaper than gather-based
    resampling for the small APE grids involved.
    """
    import numpy as np

    B, H, W, C = x.shape
    oh, ow = size
    if (H, W) == (oh, ow):
        return x

    def cubic_matrix(in_len: int, out_len: int) -> np.ndarray:
        a = -0.75

        def kernel(t):
            t = abs(t)
            if t <= 1.0:
                return (a + 2.0) * t ** 3 - (a + 3.0) * t ** 2 + 1.0
            if t < 2.0:
                return a * t ** 3 - 5.0 * a * t ** 2 + 8.0 * a * t - 4.0 * a
            return 0.0

        M = np.zeros((out_len, in_len), np.float64)
        for i in range(out_len):
            src = (i + 0.5) * in_len / out_len - 0.5
            i0 = int(np.floor(src))
            t = src - i0
            for tap, wgt in ((i0 - 1, kernel(1.0 + t)), (i0, kernel(t)),
                             (i0 + 1, kernel(1.0 - t)), (i0 + 2, kernel(2.0 - t))):
                M[i, min(max(tap, 0), in_len - 1)] += wgt
        return M.astype(np.float32)

    My = jnp.asarray(cubic_matrix(H, oh))
    Mx = jnp.asarray(cubic_matrix(W, ow))
    xf = x.astype(jnp.float32)
    out = jnp.einsum("oh,bhwc->bowc", My, xf)
    out = jnp.einsum("ow,bhwc->bhoc", Mx, out)
    return out.astype(x.dtype)


def adaptive_avg_pool(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d over NHWC: bin i spans
    [floor(i*in/out), ceil((i+1)*in/out)) — static per (in, out) pair.
    Used by the UPerNet PPM (reference UPernet.py:129) and channel-attention
    heads (pool to 1x1)."""
    import numpy as np

    B, H, W, C = x.shape
    oh, ow = out_hw
    if (oh, ow) == (1, 1):
        return jnp.mean(x, axis=(1, 2), keepdims=True)

    def pool_axis(arr, in_len, out_len, axis):
        segs = []
        for i in range(out_len):
            lo = int(np.floor(i * in_len / out_len))
            hi = int(np.ceil((i + 1) * in_len / out_len))
            segs.append(jnp.mean(
                jax.lax.slice_in_dim(arr, lo, hi, axis=axis),
                axis=axis, keepdims=True))
        return jnp.concatenate(segs, axis=axis)

    x = pool_axis(x, H, oh, axis=1)
    x = pool_axis(x, W, ow, axis=2)
    return x


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize for label maps."""
    B, H, W = x.shape[:3]
    if (H, W) == tuple(size):
        return x
    shape = (B, size[0], size[1]) + x.shape[3:]
    return jax.image.resize(x, shape, method="nearest")
