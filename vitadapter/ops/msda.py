"""Multi-scale deformable attention (MSDA) for TPU.

TPU-native replacement for the reference CUDA extension
(`detection/ops/src/cuda/ms_deform_im2col_cuda.cuh:238-300` forward,
`:301-922` backward) and its pure-PyTorch check implementation
(`detection/ops/functions/ms_deform_attn_func.py:49-71`).

Design notes (TPU-first):
  * Spatial shapes are **static** python tuples — every level's geometry is
    known at trace time, so XLA sees fixed-shape gathers and can fuse the
    bilinear arithmetic with the surrounding projections.
  * The sampling core is expressed as one batched gather per pyramid level
    (`jnp.take_along_axis`), covering all four bilinear corners of every
    sampling point at once. XLA lowers this to its native gather; the
    transpose (backward) becomes scatter-add, reproducing the CUDA
    `col2im` gradients (grad_value / grad_sampling_loc / grad_attn_weight)
    through ordinary autodiff — no atomics needed, the result is
    deterministic by construction.
  * Sampling semantics match `F.grid_sample(..., mode='bilinear',
    padding_mode='zeros', align_corners=False)`: a location in [0, 1] maps
    to pixel coordinate `loc * size - 0.5` and out-of-bounds corners
    contribute zero.
  * Values may be bf16; sampling weights and accumulation run in fp32.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

SpatialShapes = Tuple[Tuple[int, int], ...]


def level_sizes(spatial_shapes: SpatialShapes) -> Tuple[int, ...]:
    return tuple(h * w for h, w in spatial_shapes)


def level_start_index(spatial_shapes: SpatialShapes) -> Tuple[int, ...]:
    starts = [0]
    for h, w in spatial_shapes[:-1]:
        starts.append(starts[-1] + h * w)
    return tuple(starts)


def _sample_one_level(
    value_l: jax.Array,  # (B, H*W, M, D)
    loc: jax.Array,      # (B, Lq, M, P, 2) in [0, 1]
    attn_w: jax.Array,   # (B, Lq, M, P)
    H: int,
    W: int,
    accum_dtype=jnp.float32,
) -> jax.Array:
    """Bilinearly sample one pyramid level and apply attention weights.

    Returns (B, Lq, M, D) partial output for this level.
    """
    B, Lq, M, P, _ = loc.shape
    D = value_l.shape[-1]

    loc = loc.astype(jnp.float32)
    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # Four bilinear corners stacked on a trailing axis: (B, Lq, M, P, 4).
    xs = jnp.stack([x0i, x0i + 1, x0i, x0i + 1], axis=-1)
    ys = jnp.stack([y0i, y0i, y0i + 1, y0i + 1], axis=-1)
    w = jnp.stack(
        [(1 - lx) * (1 - ly), lx * (1 - ly), (1 - lx) * ly, lx * ly], axis=-1
    )
    valid = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    w = jnp.where(valid, w, 0.0)
    w = w * attn_w.astype(jnp.float32)[..., None]  # fold attention weight in

    idx = jnp.clip(ys, 0, H - 1) * W + jnp.clip(xs, 0, W - 1)

    # One gather for all (point, corner) samples of this level.
    # (B, Lq, M, P, 4) -> (B, Lq*P*4, M) indices into axis 1 of value_l.
    idx_flat = idx.transpose(0, 1, 3, 4, 2).reshape(B, Lq * P * 4, M)
    gathered = jnp.take_along_axis(value_l, idx_flat[..., None], axis=1)
    gathered = gathered.reshape(B, Lq, P * 4, M, D)

    w_flat = w.transpose(0, 1, 3, 4, 2).reshape(B, Lq, P * 4, M)
    out = jnp.einsum(
        "bqsmd,bqsm->bqmd",
        gathered.astype(accum_dtype),
        w_flat.astype(accum_dtype),
        preferred_element_type=accum_dtype,
    )
    return out


def ms_deform_attn_core(
    value: jax.Array,                 # (B, S, M, D)
    spatial_shapes: SpatialShapes,    # static ((H0,W0), ...)
    sampling_locations: jax.Array,    # (B, Lq, M, L, P, 2) in [0, 1]
    attention_weights: jax.Array,     # (B, Lq, M, L, P)
) -> jax.Array:
    """Core MSDA sampling. Returns (B, Lq, M*D).

    Math parity target: `ms_deform_attn_core_pytorch`
    (reference `detection/ops/functions/ms_deform_attn_func.py:49-71`).
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes), (L, spatial_shapes)
    assert S == sum(level_sizes(spatial_shapes)), (S, spatial_shapes)

    starts = level_start_index(spatial_shapes)
    out = jnp.zeros((B, Lq, M, D), dtype=jnp.float32)
    for lvl, (H, W) in enumerate(spatial_shapes):
        value_l = jax.lax.slice_in_dim(value, starts[lvl], starts[lvl] + H * W, axis=1)
        loc = sampling_locations[:, :, :, lvl]
        attn_w = attention_weights[:, :, :, lvl]
        out = out + _sample_one_level(value_l, loc, attn_w, H, W)
    return out.reshape(B, Lq, M * D).astype(value.dtype)


# The 4-corner take_along formulation doubles as the readable reference
# implementation for parity tests.
msda_reference = ms_deform_attn_core


def _sample_level_block(
    value_bm: jax.Array,   # (B*M, H+2, W+2, D) zero-padded map
    loc: jax.Array,        # (B, Lq, M, P, 2)
    attn_w: jax.Array,     # (B, Lq, M, P)
    H: int,
    W: int,
) -> jax.Array:
    """One 2x2xD block gather per sample (the TPU-fast formulation).

    The value map carries a 1-pixel zero ring, so in-support out-of-bounds
    corners read exact zeros and no per-corner masking is needed; samples
    entirely outside the support get zero weights.
    """
    B, Lq, M, P, _ = loc.shape
    D = value_bm.shape[-1]
    wdt = value_bm.dtype
    loc = loc.astype(jnp.float32)
    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0).astype(wdt)
    ly = (y - y0).astype(wdt)
    wy = jnp.stack([1 - ly, ly], axis=-1)
    wx = jnp.stack([1 - lx, lx], axis=-1)
    wgt = wy[..., :, None] * wx[..., None, :] * attn_w.astype(wdt)[..., None, None]
    ok = (x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1)
    wgt = jnp.where(ok[..., None, None], wgt, 0)

    ys = jnp.clip(y0.astype(jnp.int32) + 1, 0, H)
    xs = jnp.clip(x0.astype(jnp.int32) + 1, 0, W)
    starts = jnp.stack([ys, xs], axis=-1)           # (B, Lq, M, P, 2)
    starts = starts.transpose(0, 2, 1, 3, 4).reshape(B * M, Lq * P, 2)

    def gather_one(vm, st):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        return jax.lax.gather(vm, st, dn, (2, 2, D), mode="clip")

    g = jax.vmap(gather_one)(value_bm, starts)      # (B*M, Lq*P, 2, 2, D)
    g = g.reshape(B, M, Lq, P, 2, 2, D)
    wgt = wgt.transpose(0, 2, 1, 3, 4, 5)           # (B, M, Lq, P, 2, 2)
    return jnp.einsum("bmqpyxd,bmqpyx->bqmd", g, wgt,
                      preferred_element_type=jnp.float32)


def ms_deform_attn_block(
    value: jax.Array,
    spatial_shapes: SpatialShapes,
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """Block-gather MSDA: one contiguous (2, 2, D) gather per sample.

    ~1.6x faster than the 4-corner row-gather on v5e (better gather
    granularity, no corner masks, fewer index computations).
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    starts = level_start_index(spatial_shapes)
    out = jnp.zeros((B, Lq, M, D), jnp.float32)
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = jax.lax.slice_in_dim(value, starts[lvl], starts[lvl] + H * W,
                                 axis=1)
        vm = v.reshape(B, H, W, M, D).transpose(0, 3, 1, 2, 4)
        vm = vm.reshape(B * M, H, W, D)
        vm = jnp.pad(vm, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = out + _sample_level_block(
            vm, sampling_locations[:, :, :, lvl],
            attention_weights[:, :, :, lvl], H, W)
    return out.reshape(B, Lq, M * D).astype(value.dtype)


def ms_deform_attn(
    value: jax.Array,
    spatial_shapes: SpatialShapes,
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    impl: str = "auto",
    query_segments: Optional[Tuple[int, ...]] = None,
) -> jax.Array:
    """Multi-scale deformable attention sampling with implementation dispatch.

    impl:
      'pallas' — MXU contraction kernel (fastest on TPU; ~2x over 'block')
      'block'  — XLA 2x2xD block gather (TPU-fast, runs everywhere)
      'xla'    — 4-corner take_along reference formulation
      'auto'   — pallas on TPU, block elsewhere

    query_segments: static per-level query counts when the queries are a
    concatenation of raster-ordered pyramid grids (perf hint for the Pallas
    kernel's row-band skipping; the math is implementation-independent).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "block"
    if impl == "pallas":
        from vitadapter.ops.msda_pallas import ms_deform_attn_pallas
        segs = tuple(query_segments) if query_segments else None
        return ms_deform_attn_pallas(
            value, spatial_shapes, sampling_locations, attention_weights,
            segs)
    if impl == "block":
        return ms_deform_attn_block(
            value, spatial_shapes, sampling_locations, attention_weights)
    if impl == "xla":
        return ms_deform_attn_core(
            value, spatial_shapes, sampling_locations, attention_weights)
    raise ValueError(f"unknown msda impl: {impl!r}")


def msda_grid_init(n_heads: int, n_levels: int, n_points: int) -> jnp.ndarray:
    """Directional bias init for the sampling-offset head.

    Reproduces `MSDeformAttn._reset_parameters`
    (reference `detection/ops/modules/ms_deform_attn.py:64-75`): head h points
    along angle 2*pi*h/n_heads, normalized to the unit Linf ball, scaled by
    (point index + 1).
    """
    thetas = jnp.arange(n_heads, dtype=jnp.float32) * (2.0 * math.pi / n_heads)
    grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], axis=-1)  # (M, 2)
    grid = grid / jnp.max(jnp.abs(grid), axis=-1, keepdims=True)
    grid = jnp.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    scale = jnp.arange(1, n_points + 1, dtype=jnp.float32)[None, None, :, None]
    grid = grid * scale
    return grid.reshape(-1)


class MSDeformAttn(nn.Module):
    """Multi-Scale Deformable Attention module.

    Parity target: `ops.modules.MSDeformAttn`
    (reference `detection/ops/modules/ms_deform_attn.py:28-130`).

    Call signature:
      query:            (B, Lq, C)
      reference_points: (B, Lq, n_levels, 2) in [0,1] or (..., 4) boxes
      input_flatten:    (B, S, C) multi-level values, S = sum(H_l*W_l)
      spatial_shapes:   static tuple ((H0,W0), ...)
      padding mask:     optional (B, S) True-for-pad
    """

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    ratio: float = 1.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.d_model % self.n_heads != 0:
            raise ValueError(
                f"d_model ({self.d_model}) must be divisible by n_heads ({self.n_heads})"
            )
        d_value = int(self.d_model * self.ratio)
        if d_value % self.n_heads != 0:
            raise ValueError(
                f"value dim ({d_value}) must be divisible by n_heads ({self.n_heads})"
            )
        M, L, P = self.n_heads, self.n_levels, self.n_points
        self.sampling_offsets = nn.Dense(
            M * L * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: msda_grid_init(M, L, P).astype(dtype),
            dtype=self.dtype,
            name="sampling_offsets",
        )
        self.attention_weights = nn.Dense(
            M * L * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )
        self.value_proj = nn.Dense(
            d_value,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="value_proj",
        )
        self.output_proj = nn.Dense(
            self.d_model,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="output_proj",
        )

    def __call__(
        self,
        query: jax.Array,
        reference_points: jax.Array,
        input_flatten: jax.Array,
        spatial_shapes: SpatialShapes,
        input_padding_mask: Optional[jax.Array] = None,
        query_segments: Optional[Tuple[int, ...]] = None,
    ) -> jax.Array:
        B, Lq, _ = query.shape
        S = input_flatten.shape[1]
        assert S == sum(level_sizes(spatial_shapes))
        M, L, P = self.n_heads, self.n_levels, self.n_points
        assert L == len(spatial_shapes)

        value = self.value_proj(input_flatten)
        if input_padding_mask is not None:
            value = jnp.where(input_padding_mask[..., None], 0.0, value)
        value = value.reshape(B, S, M, -1)

        offsets = self.sampling_offsets(query).reshape(B, Lq, M, L, P, 2)
        attn = self.attention_weights(query).reshape(B, Lq, M, L * P)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).reshape(B, Lq, M, L, P)

        if reference_points.shape[-1] == 2:
            # normalizer is (W, H) per level — x offsets scale by width.
            normalizer = jnp.asarray(
                [(w, h) for h, w in spatial_shapes], dtype=jnp.float32
            )  # (L, 2)
            locations = (
                reference_points[:, :, None, :, None, :]
                + offsets.astype(jnp.float32) / normalizer[None, None, None, :, None, :]
            )
        elif reference_points.shape[-1] == 4:
            locations = (
                reference_points[:, :, None, :, None, :2]
                + offsets.astype(jnp.float32)
                / P
                * reference_points[:, :, None, :, None, 2:]
                * 0.5
            )
        else:
            raise ValueError(
                f"reference_points last dim must be 2 or 4, got {reference_points.shape[-1]}"
            )

        out = ms_deform_attn(value, spatial_shapes, locations, attn,
                             query_segments=query_segments)
        return self.output_proj(out)
