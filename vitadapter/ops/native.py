"""ctypes bindings for the native C++ runtime components.

The shared library is built on demand from `native/` with g++ (no pybind11 —
plain C ABI + ctypes, per the environment constraints). Falls back to scipy
if the toolchain is unavailable.
"""

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")


@lru_cache()
def _lib() -> Optional[ctypes.CDLL]:
    src = os.path.join(_NATIVE_DIR, "lap.cpp")
    so = os.path.join(_NATIVE_DIR, "libvitadapter_native.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.lap_solve_batch.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.lap_solve_batch.restype = None
        return lib
    except Exception:
        return None


def native_available() -> bool:
    return _lib() is not None


def lap_solve_batch(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """Exact batched LAP. cost (B, Q, G) float; n_valid (B,) ints.

    Returns (B, Q) int32 column per row or -1.
    """
    lib = _lib()
    B, Q, G = cost.shape
    if lib is None:  # scipy fallback (reference numerics)
        from vitadapter.ops.matching import _solve_batch
        return _solve_batch(np.asarray(cost, np.float32),
                            np.asarray(n_valid, np.int32))
    c = np.ascontiguousarray(cost, np.float64)
    c = np.nan_to_num(c, nan=1e8, posinf=1e8, neginf=-1e8)
    nv = np.ascontiguousarray(n_valid, np.int32)
    out = np.empty((B, Q), np.int32)
    lib.lap_solve_batch(
        B, Q, G,
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nv.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out
