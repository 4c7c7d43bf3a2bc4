"""Native (C++) host-side kernels, ctypes-bound.

The reference's data path runs an O(npoint * N) Python-loop FPS per worker
(dataset.py:1147-1163). ``fps_native`` is the C++ replacement built from
fps.cpp via ``make`` (see Makefile); import fails cleanly (ImportError) when
the shared object hasn't been built, and callers fall back to numpy.
"""

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libpuzzlenet_native.so")

if not os.path.exists(_LIB_PATH):
    raise ImportError(f"native library not built: {_LIB_PATH}")

_lib = ctypes.CDLL(_LIB_PATH)
_lib.fps_f32.argtypes = [
    ctypes.POINTER(ctypes.c_float),  # xyz [n, 3]
    ctypes.c_int,                    # n
    ctypes.c_int,                    # npoint
    ctypes.c_int,                    # start
    ctypes.POINTER(ctypes.c_int64),  # out idx [npoint]
]
_lib.fps_f32.restype = None


def fps_native(xyz, npoint, start=0):
    """FPS indices via the C++ kernel: xyz [n, 3] float32 -> [npoint] int64."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    n = xyz.shape[0]
    out = np.empty(npoint, np.int64)
    _lib.fps_f32(
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n), ctypes.c_int(npoint), ctypes.c_int(start),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out
