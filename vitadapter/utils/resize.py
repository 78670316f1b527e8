"""Torch-parity separable image resizing as static matrix contractions.

torch `F.interpolate(mode='bicubic'|'bilinear', align_corners=False)` uses
half-pixel sampling with a cubic-convolution kernel a=-0.75 and border
clamping. `jax.image.resize` uses a=-0.5 (Catmull-Rom) and antialiasing by
default, so it does NOT reproduce torch numerics. Since all shapes here are
static, we materialize the 1-D interpolation matrices host-side (numpy) and
let the resize compile into two small matmuls — both exact and MXU-friendly.

Used by pos-embed resampling (reference `vit_adapter.py:73-78`) and the
`add_vit_feature` pyramid broadcast (reference `vit_adapter.py:120-125`).
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    at = np.abs(t)
    return np.where(
        at <= 1.0,
        (a + 2) * at**3 - (a + 3) * at**2 + 1,
        np.where(at < 2.0, a * (at**3 - 5 * at**2 + 8 * at - 4), 0.0),
    )


def _linear_kernel(t: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(t))


@lru_cache(maxsize=256)
def resize_matrix(n_in: int, n_out: int, method: str = "bilinear") -> np.ndarray:
    """(n_out, n_in) interpolation matrix, half-pixel centers, clamped borders."""
    if n_in == n_out:
        return np.eye(n_in, dtype=np.float32)
    scale = n_in / n_out
    if method == "nearest":
        # torch F.interpolate(mode='nearest'): src = floor(dst * in/out),
        # asymmetric coordinates (NOT half-pixel)
        M = np.zeros((n_out, n_in), dtype=np.float64)
        idx = np.minimum((np.arange(n_out) * scale).astype(np.int64),
                         n_in - 1)
        M[np.arange(n_out), idx] = 1.0
        return M.astype(np.float32)
    centers = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
    base = np.floor(centers).astype(np.int64)
    M = np.zeros((n_out, n_in), dtype=np.float64)
    if method == "bicubic":
        taps, kern = range(-1, 3), _cubic_kernel
    elif method == "bilinear":
        taps, kern = range(0, 2), _linear_kernel
    else:
        raise ValueError(method)
    rows = np.arange(n_out)
    for k in taps:
        idx = np.clip(base + k, 0, n_in - 1)
        w = kern(centers - (base + k))
        np.add.at(M, (rows, idx), w)
    return M.astype(np.float32)


def resize_2d(x: jax.Array, out_hw, method: str = "bilinear") -> jax.Array:
    """Resize (..., H, W, C) maps to (..., H', W', C) with torch semantics."""
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = out_hw
    if (H, W) == (Ho, Wo):
        return x
    if x.shape[-1] == 1:
        # trailing dim 1 wastes 127/128 lanes on TPU — use the HW path
        return resize_hw(x[..., 0], out_hw, method)[..., None]
    mh = jnp.asarray(resize_matrix(H, Ho, method))
    mw = jnp.asarray(resize_matrix(W, Wo, method))
    dtype = x.dtype
    if dtype == jnp.bfloat16:
        # keep the big (..., H, W, C) maps bf16 end-to-end: promoting to
        # fp32 doubles the HBM traffic of both contractions (the TPU matmul
        # accumulates in fp32 either way; bf16 tap weights cost ~0.4%
        # relative error on a 2-tap bilinear — invisible at eval)
        y = jnp.einsum("oh,...hwc->...owc", mh.astype(dtype), x)
        return jnp.einsum("ow,...hwc->...hoc", mw.astype(dtype), y)
    y = jnp.einsum("oh,...hwc->...owc", mh, x.astype(jnp.float32))
    y = jnp.einsum("ow,...hwc->...hoc", mw, y)
    return y.astype(dtype)


def resize_hw(x: jax.Array, out_hw, method: str = "bilinear") -> jax.Array:
    """Resize channel-free (..., H, W) maps (masks, logit fields)."""
    H, W = x.shape[-2], x.shape[-1]
    Ho, Wo = out_hw
    if (H, W) == (Ho, Wo):
        return x
    mh = jnp.asarray(resize_matrix(H, Ho, method))
    mw = jnp.asarray(resize_matrix(W, Wo, method))
    dtype = x.dtype
    y = jnp.einsum("oh,...hw->...ow", mh, x.astype(jnp.float32))
    y = jnp.einsum("ow,...hw->...ho", mw, y)
    return y.astype(dtype)
