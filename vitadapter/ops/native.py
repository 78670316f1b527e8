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


_SOURCES = ("lap.cpp", "rle.cpp")


@lru_cache()
def _lib() -> Optional[ctypes.CDLL]:
    srcs = [os.path.join(_NATIVE_DIR, s) for s in _SOURCES]
    so = os.path.join(_NATIVE_DIR, "libvitadapter_native.so")
    try:
        if (not os.path.exists(so)
                or any(os.path.getmtime(so) < os.path.getmtime(s)
                       for s in srcs)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so] + srcs,
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.lap_solve_batch.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.lap_solve_batch.restype = None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.rle_encode_mask.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int)]
        lib.rle_encode_mask.restype = None
        lib.rle_decode_mask.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p]
        lib.rle_decode_mask.restype = None
        lib.mask_iou_batch.argtypes = [
            u8p, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_long, u8p,
            ctypes.POINTER(ctypes.c_double)]
        lib.mask_iou_batch.restype = None
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


def rle_encode(mask: np.ndarray) -> Optional[str]:
    """Binary (H, W) mask -> COCO compressed counts string (C codec;
    `native/rle.cpp::rle_encode_mask`). None if the library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask, np.uint8)
    h, w = m.shape
    buf = ctypes.create_string_buffer(6 * (h * w + 2))
    n = ctypes.c_int(0)
    lib.rle_encode_mask(m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        h, w, buf, ctypes.byref(n))
    return buf.raw[:n.value].decode("ascii")


def rle_decode(counts: str, h: int, w: int) -> Optional[np.ndarray]:
    """COCO compressed counts string -> binary (H, W) uint8 mask (C codec)."""
    lib = _lib()
    if lib is None:
        return None
    s = counts.encode("ascii")
    out = np.empty((h, w), np.uint8)
    lib.rle_decode_mask(s, len(s), h, w,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def mask_iou_native(dets: np.ndarray, gts: np.ndarray,
                    iscrowd: Optional[np.ndarray] = None
                    ) -> Optional[np.ndarray]:
    """Pairwise mask IoU (D, G) via bit-packed popcount
    (`native/rle.cpp::mask_iou_batch`). None if unavailable."""
    lib = _lib()
    if lib is None:
        return None
    d = np.ascontiguousarray(dets.reshape(dets.shape[0], -1), np.uint8)
    g = np.ascontiguousarray(gts.reshape(gts.shape[0], -1), np.uint8)
    D, hw = d.shape
    G = g.shape[0]
    crowd = (np.ascontiguousarray(iscrowd, np.uint8)
             if iscrowd is not None else np.zeros(G, np.uint8))
    out = np.empty((D, G), np.float64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.mask_iou_batch(d.ctypes.data_as(u8p), D, g.ctypes.data_as(u8p), G,
                       hw, crowd.ctypes.data_as(u8p),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
