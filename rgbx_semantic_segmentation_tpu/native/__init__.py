"""Native (C++) host-side ops, loaded via ctypes.

`lib()` returns the loaded shared library or None when it hasn't been built
(python -m rgbx_semantic_segmentation_tpu.native.build). The numpy
implementations in data/cv_ops.py remain the reference semantics; the native
versions are bit-compatible fast paths for the training input pipeline.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libcvops.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        return None
    try:
        cdll = ctypes.CDLL(_SO)
    except OSError:
        return None
    u8 = ctypes.POINTER(ctypes.c_uint8)
    f32 = ctypes.POINTER(ctypes.c_float)
    i = ctypes.c_int
    cdll.resize_linear_u8.argtypes = [u8, i, i, i, u8, i, i]
    cdll.resize_linear_f32.argtypes = [f32, i, i, i, f32, i, i]
    cdll.resize_nearest_u8.argtypes = [u8, i, i, i, u8, i, i]
    cdll.normalize_u8.argtypes = [u8, i, i, i, f32, f32, f32]
    cdll.gaussian_blur_u8.argtypes = [u8, i, i, i, f32, i, u8]
    cdll.hsv_jitter_u8.argtypes = [u8, i, i, ctypes.c_float, ctypes.c_float,
                                   ctypes.c_float, u8]
    _lib = cdll
    return _lib


def ensure_built() -> Optional[ctypes.CDLL]:
    """Build the library if g++ is available, then load it."""
    global _tried
    if lib() is not None:
        return _lib
    try:
        from rgbx_semantic_segmentation_tpu.native.build import build

        build(verbose=False)
    except Exception:
        return None
    _tried = False
    return lib()
