"""Build the native cv_ops shared library.

Usage:
    python -m rgbx_semantic_segmentation_tpu.native.build

Produces libcvops.so next to cv_ops.cpp; data/cv_ops.py auto-loads it via
ctypes when present and falls back to numpy otherwise.
"""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "cv_ops.cpp")
OUT = os.path.join(HERE, "libcvops.so")


def build(verbose: bool = True) -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", SRC, "-o", OUT,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
