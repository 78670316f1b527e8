"""Pallas bilinear point-sample kernel vs the XLA gather reference.

The kernel replaces XLA's serialized gather lowering in the PointRend mask
losses (reference mmcv `point_sample`); grad_points is zero by definition
(coords are detached in every caller).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vitadapter.ops.point_sample_pallas import point_sample_pallas


@pytest.fixture(autouse=True)
def _interpret():
    # CPU backend runs the kernel in interpret mode (compiled on TPU)
    with pltpu.force_tpu_interpret_mode():
        yield


def _xla_ref(masks, points):
    N, H, W = masks.shape
    x = points[..., 0] * W - 0.5
    y = points[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    out = jnp.zeros(points.shape[:-1], jnp.float32)
    flat = masks.reshape(N, H * W)
    for dx, dy, w in ((0, 0, (1 - lx) * (1 - ly)), (1, 0, lx * (1 - ly)),
                      (0, 1, (1 - lx) * ly), (1, 1, lx * ly)):
        xi = x0i + dx
        yi = y0i + dy
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        g = jnp.take_along_axis(flat, idx.reshape(N, -1),
                                axis=1).reshape(idx.shape)
        out = out + jnp.where(valid, w * g, 0.0)
    return out


def test_forward_parity_with_oob_points():
    rng = np.random.RandomState(0)
    masks = jnp.asarray(rng.randn(4, 37, 29), jnp.float32)
    pts = jnp.asarray(rng.rand(4, 700, 2) * 1.2 - 0.1, jnp.float32)
    r = _xla_ref(masks, pts)
    p = point_sample_pallas(masks, pts)
    assert float(jnp.abs(r - p).max()) < 1e-5 * float(jnp.abs(r).max() + 1)


def test_grad_mask_parity_and_zero_grad_points():
    rng = np.random.RandomState(1)
    masks = jnp.asarray(rng.randn(3, 24, 40), jnp.float32)
    pts = jnp.asarray(rng.rand(3, 300, 2), jnp.float32)
    g = jnp.asarray(rng.randn(3, 300), jnp.float32)
    dr = jax.grad(lambda m: (_xla_ref(m, pts) * g).sum())(masks)
    dp, dpts = jax.grad(
        lambda m, p: (point_sample_pallas(m, p) * g).sum(),
        argnums=(0, 1))(masks, pts)
    assert float(jnp.abs(dr - dp).max()) < 1e-5 * float(jnp.abs(dr).max() + 1)
    # contract: coordinates get NO gradient from the kernel
    assert float(jnp.abs(dpts).max()) == 0.0


def test_nonmultiple_point_count_padding():
    rng = np.random.RandomState(2)
    masks = jnp.asarray(rng.randn(2, 16, 16), jnp.float32)
    pts = jnp.asarray(rng.rand(2, 13, 2), jnp.float32)
    r = _xla_ref(masks, pts)
    p = point_sample_pallas(masks, pts)
    assert p.shape == (2, 13)
    assert float(jnp.abs(r - p).max()) < 1e-5


def test_banded_tall_mask_sorted_and_unsorted():
    """H > PS_RC takes the banded forward (scalar-prefetched row bounds,
    dynamic chunk loop). Parity must hold both for row-sorted points (narrow
    bands — the loss path) and unsorted ones (full-height bands)."""
    from vitadapter.ops.point_sample_pallas import sort_points_by_y

    rng = np.random.RandomState(3)
    masks = jnp.asarray(rng.randn(2, 512, 64), jnp.float32)
    pts = jnp.asarray(rng.rand(2, 4100, 2) * 1.1 - 0.05, jnp.float32)
    for p in (pts, sort_points_by_y(pts)):
        r = _xla_ref(masks, p)
        out = point_sample_pallas(masks, p)
        assert float(jnp.abs(r - out).max()) < 1e-5 * float(
            jnp.abs(r).max() + 1)


def test_banded_nonmultiple_height_and_empty_tiles():
    """Rows pad to the chunk size (200 -> 256, zero rows) and a fully
    out-of-bounds point tile must produce zero chunks, not garbage."""
    rng = np.random.RandomState(4)
    masks = jnp.asarray(rng.randn(1, 200, 32), jnp.float32)
    pts = np.concatenate([
        rng.rand(1, 2048, 2) * np.asarray([1.0, 0.1]),    # top rows
        np.full((1, 2048, 2), 7.0),                       # tile fully OOB
        rng.rand(1, 500, 2) * 0.2 + 0.8,                  # bottom rows
    ], axis=1)
    pts = jnp.asarray(pts, jnp.float32)
    r = _xla_ref(masks, pts)
    out = point_sample_pallas(masks, pts)
    assert float(jnp.abs(r - out).max()) < 1e-5 * float(jnp.abs(r).max() + 1)
    assert float(jnp.abs(out[:, 2048:4096]).max()) == 0.0


def test_sort_points_by_y_preserves_point_set():
    rng = np.random.RandomState(5)
    pts = jnp.asarray(rng.rand(3, 257, 2), jnp.float32)
    from vitadapter.ops.point_sample_pallas import sort_points_by_y
    s = sort_points_by_y(pts)
    # same multiset of (x, y) pairs, y ascending
    a = np.sort(np.asarray(pts).view(np.float32).reshape(3, 257, 2), axis=1)
    b = np.sort(np.asarray(s).reshape(3, 257, 2), axis=1)
    np.testing.assert_allclose(a, b)
    assert bool((jnp.diff(s[..., 1], axis=-1) >= 0).all())
