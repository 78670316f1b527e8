"""Point sampling for mask losses (PointRend-style).

Parity targets: mmcv `point_sample` (grid_sample bilinear, align_corners=False
on [0,1] coords) and `get_uncertain_point_coords_with_randomness`
(reference `segmentation/mmseg_custom/models/utils/point_sample.py:6,32`).
"""

import os
from typing import Tuple

import jax
import jax.numpy as jnp

_EXACT_TOPK = os.environ.get("VITADAPTER_EXACT_TOPK_POINTS", "0") == "1"


def point_sample(masks: jax.Array, points: jax.Array) -> jax.Array:
    """Bilinearly sample masks at normalized points.

    masks:  (N, H, W)
    points: (N, P, 2) xy in [0, 1]
    returns (N, P)

    grid_sample(align_corners=False) semantics: pixel coord = p*size - 0.5,
    zero outside.

    On TPU routes through the Pallas one-hot-contraction kernel
    (`ops/point_sample_pallas.py` — XLA's gather lowering serializes here);
    NOTE the kernel defines grad_points = 0, which matches every in-tree
    caller (PointRend losses detach coords). Set
    VITADAPTER_POINT_SAMPLE_PALLAS=0 if you need dpoints.
    """
    from vitadapter.ops.point_sample_pallas import (
        point_sample_pallas, use_pallas_point_sample)
    if use_pallas_point_sample():
        return point_sample_pallas(masks, points)
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
        g = jnp.take_along_axis(flat, idx.reshape(N, -1), axis=1)
        g = g.reshape(idx.shape)
        out = out + jnp.where(valid, w * g, 0.0)
    return out


def uncertainty(logits: jax.Array) -> jax.Array:
    """-|logit|: highest near the decision boundary."""
    return -jnp.abs(logits)


def get_uncertain_point_coords(
    rng: jax.Array,
    mask_logits: jax.Array,   # (N, H, W)
    num_points: int,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
) -> jax.Array:
    """Sample (N, num_points, 2) coords: top-uncertainty among oversampled
    random points plus fresh random points (reference `point_sample.py:32`).

    On TPU the global top-k over the oversampled pool is replaced by
    stratified bucket-max selection: the pool is split into `n_important`
    random buckets and the most uncertain point of each bucket is kept.
    XLA's sort-based top_k at loss scale (400 rows x 37632, k=9408) costs
    ~400 ms per decoder layer on v5e; bucket-max is a single cheap argmax
    over a tiny axis and needs NO gather (one-hot combine). The pool is
    uniform-random, so this remains valid importance sampling — it trades
    the exact top set for spatial stratification of the selection (each
    kept point wins a random tournament of `oversample_ratio /
    importance_sample_ratio` candidates). Set
    VITADAPTER_EXACT_TOPK_POINTS=1 to force the reference's exact top-k.
    """
    N = mask_logits.shape[0]
    n_sampled = int(num_points * oversample_ratio)
    n_important = int(importance_sample_ratio * num_points)
    n_random = num_points - n_important
    r1, r2 = jax.random.split(rng)
    coords = jax.random.uniform(r1, (N, n_sampled, 2))
    logits = point_sample(mask_logits, coords)
    unc = uncertainty(logits)
    bucket = n_sampled // max(n_important, 1)
    if (jax.default_backend() == "tpu" and not _EXACT_TOPK
            and bucket >= 2):
        n_used = n_important * bucket
        u = unc[:, :n_used].reshape(N, n_important, bucket)
        best = jnp.argmax(u, axis=-1)                      # (N, n_imp)
        sel = jax.nn.one_hot(best, bucket, dtype=coords.dtype)
        c = coords[:, :n_used].reshape(N, n_important, bucket, 2)
        important = jnp.einsum("nkb,nkbc->nkc", sel, c)
    else:
        _, top_idx = jax.lax.top_k(unc, n_important)
        important = jnp.take_along_axis(coords, top_idx[..., None], axis=1)
    if n_random > 0:
        rand = jax.random.uniform(r2, (N, n_random, 2))
        return jnp.concatenate([important, rand], axis=1)
    return important
