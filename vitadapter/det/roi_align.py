"""RoIAlign as batched bilinear gathers (XLA-native).

Parity target: mmcv/torchvision RoIAlign with `aligned=True`,
sampling_ratio=0 (adaptive — here fixed to 2 samples per bin axis, matching
mmdet's default RoIAlign(output_size=7, sampling_ratio=0) on typical roi
sizes) — the standard Mask R-CNN configuration used by the reference configs.

TPU-first: every roi produces a static (out, out, S, S) grid of sample
coordinates; sampling is one big gather + mean, fused by XLA. Level
assignment for FPN follows mmdet `SingleRoIExtractor` (floor(log2(
sqrt(area)/56 + eps)) clamped to [0, L-1]).
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def roi_align(feat: jax.Array, rois: jax.Array, out_size: int,
              spatial_scale: float, sampling_ratio: int = 2) -> jax.Array:
    """feat (H, W, C); rois (R, 4) xyxy in image coords -> (R, out, out, C).

    aligned=True: coordinates are shifted by -0.5 (pixel-center alignment).
    """
    H, W, C = feat.shape
    R = rois.shape[0]
    S = max(sampling_ratio, 1)
    boxes = rois * spatial_scale
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)
    # sample centers: out_size bins, S x S samples per bin
    def centers(lo, extent):
        # (R, out*S) positions
        step = extent[:, None] / (out_size * S)
        idx = jnp.arange(out_size * S, dtype=jnp.float32) + 0.5
        return lo[:, None] + idx * step - 0.5  # aligned=True shift

    xs = centers(x1, bw)  # (R, out*S)
    ys = centers(y1, bh)
    # bilinear sample feat at (ys, xs) outer grid
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    lx = xs - x0
    ly = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = feat.reshape(H * W, C)
    out = jnp.zeros((R, out_size * S, out_size * S, C), jnp.float32)
    for dy, wy in ((0, 1 - ly), (1, ly)):
        for dx, wx in ((0, 1 - lx), (1, lx)):
            xi = x0i + dx
            yi = y0i + dy
            vx = (xi >= 0) & (xi < W)
            vy = (yi >= 0) & (yi < H)
            xi = jnp.clip(xi, 0, W - 1)
            yi = jnp.clip(yi, 0, H - 1)
            idx = yi[:, :, None] * W + xi[:, None, :]  # (R, oS, oS)
            g = flat[idx.reshape(R, -1)].reshape(R, out_size * S,
                                                 out_size * S, C)
            w = (wy * vy)[:, :, None] * (wx * vx)[:, None, :]
            out = out + g * w[..., None]
    # average S x S samples per bin
    out = out.reshape(R, out_size, S, out_size, S, C).mean(axis=(2, 4))
    return out


def crop_resize_masks(gt_masks: jax.Array, rois: jax.Array,
                      gt_idx: jax.Array, out_size: int = 28) -> jax.Array:
    """Mask targets: bilinearly crop each roi's assigned gt mask to out^2.

    gt_masks (G, H, W) {0,1}; rois (R, 4) image coords; gt_idx (R,).
    Parity: mmdet BitmapMasks.crop_and_resize (roi_align on the mask,
    aligned, 1 sample/bin). Implemented as one flat gather — the per-roi
    (H, W) mask is never materialized.
    """
    G, H, W = gt_masks.shape
    R = rois.shape[0]
    x1, y1, x2, y2 = (rois[:, i] for i in range(4))
    idxs = jnp.arange(out_size, dtype=jnp.float32) + 0.5
    xs = x1[:, None] + idxs * ((x2 - x1)[:, None] / out_size) - 0.5
    ys = y1[:, None] + idxs * ((y2 - y1)[:, None] / out_size) - 0.5
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    lx = xs - x0
    ly = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = gt_masks.reshape(G * H * W).astype(jnp.float32)
    base = (gt_idx * (H * W))[:, None, None]
    out = jnp.zeros((R, out_size, out_size), jnp.float32)
    for dy, wy in ((0, 1 - ly), (1, ly)):
        for dx, wx in ((0, 1 - lx), (1, lx)):
            xi = jnp.clip(x0i + dx, 0, W - 1)
            yi = jnp.clip(y0i + dy, 0, H - 1)
            vx = ((x0i + dx) >= 0) & ((x0i + dx) < W)
            vy = ((y0i + dy) >= 0) & ((y0i + dy) < H)
            idx = base + yi[:, :, None] * W + xi[:, None, :]
            g = flat[idx.reshape(-1)].reshape(R, out_size, out_size)
            w = (wy * vy)[:, :, None] * (wx * vx)[:, None, :]
            out = out + g * w
    return (out >= 0.5).astype(jnp.float32)


def assign_fpn_levels(rois: jax.Array, num_levels: int,
                      finest_scale: int = 56) -> jax.Array:
    """mmdet SingleRoIExtractor.map_roi_levels."""
    scale = jnp.sqrt(jnp.maximum(
        (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 0))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def multi_level_roi_align(feats: Sequence[jax.Array], rois: jax.Array,
                          out_size: int, strides: Sequence[int],
                          sampling_ratio: int = 2) -> jax.Array:
    """Extract (R, out, out, C) from the per-roi FPN level.

    Static-shape approach: sample every roi from every level, then select by
    the assigned level (L small, so L gathers of the same size; XLA keeps it
    parallel and branch-free).
    """
    L = len(feats)
    lvl = assign_fpn_levels(rois, L)
    outs = jnp.stack([
        roi_align(f, rois, out_size, 1.0 / s, sampling_ratio)
        for f, s in zip(feats, strides)], axis=0)  # (L, R, o, o, C)
    onehot = jax.nn.one_hot(lvl, L, dtype=outs.dtype)  # (R, L)
    return jnp.einsum("lrhwc,rl->rhwc", outs, onehot)
