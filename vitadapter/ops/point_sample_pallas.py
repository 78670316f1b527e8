"""Pallas TPU kernel for bilinear point sampling (PointRend mask losses).

XLA lowers `take_along_axis` over the flattened mask to serialized TPU
gathers; at Mask2Former loss scale (B*Q=400 masks x 12544 points x 4
corners x 10 decoder-layer losses) that made the flagship train step
~17 s. The kernel instead expresses bilinear sampling as two small
contractions per point tile (the same compare-free relu one-hot scheme as
`ops/msda_pallas`), in a transposed (grid-dim, point-lane) orientation:

    Ry_t  = relu(1 - |iota_h - y|)          (H, TP)
    tmp_t = m^T @ Ry_t                      (W, TP)   MXU
    Rx_t  = relu(1 - |iota_w - x|)          (W, TP)
    out   = colsum(Rx_t * tmp_t)            (1, TP)

Coordinates ship as separate 2-D (N, P) y/x arrays (an (N, P, 2) layout
tile-pads the size-2 trailing dim 64x in HBM), and each program covers a
sublane-group of NB=8 masks so every block satisfies the (8, 128) tiling
rule without padding waste.

This is exact bilinear interpolation with grid_sample(align_corners=False)
zero padding. The custom VJP produces grad_mask only — **grad_points is
defined as zero** (sampling coordinates are always detached in the
PointRend losses, reference `mask2former_head.py:154-360`; use the XLA
path in `ops/point_sample.py` if you ever need dpoints).

Replaces the role of `F.grid_sample` inside mmcv `point_sample`
(reference `segmentation/mmseg_custom/models/utils/point_sample.py:6`).
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PS_TILE = 2048          # points per program (per mask)
NB = 8                  # masks per program (sublane group)
PS_VMEM = 64 * 1024 * 1024
# row-chunk height for band skipping on tall masks (H > PS_RC): 128 keeps
# the contraction K dim at full MXU depth, so skipped chunks are pure wins
PS_RC = int(os.environ.get("VITADAPTER_PS_ROW_CHUNK", "128"))


def _fwd_kernel(bounds_ref, y_ref, x_ref, m_ref, o_ref, *, H, W, TP):
    """Banded forward: each (mask, point-tile) contracts only the RC-row
    chunks its points' corner rows fall in (scalar-prefetched bounds).
    Callers that sort points by row (`sort_points_by_y`) make the per-tile
    bands narrow — H/RC-fold fewer MACs on tall masks (e.g. 4x at the
    512px gt label resolution); unsorted points degrade gracefully to the
    full-height contraction.

    Orientation: the MXU contracts the W axis FIRST (mc @ Rx -> (RC, TP)),
    so the per-chunk VPU combine runs on the small (RC, TP) array rather
    than (W, TP) — at the 512-wide gt label resolution that halves the
    kernel's VPU work (its measured bottleneck), and the W-deep contraction
    feeds the MXU a full-depth K."""
    dt = m_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    n = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    iw = jax.lax.broadcasted_iota(jnp.int32, (W, TP), 0).astype(jnp.float32)
    RC = min(PS_RC, H)
    for i in range(NB):
        y = y_ref[i:i + 1, :]                             # (1, TP) fp32
        x = x_ref[i:i + 1, :]
        Rx = jnp.maximum(1.0 - jnp.abs(iw - x), 0.0).astype(dt)

        def chunk(c0, dyn, y=y, Rx=Rx, i=i):
            ih = (jax.lax.broadcasted_iota(jnp.int32, (RC, TP), 0)
                  + c0).astype(jnp.float32)
            Ry = jnp.maximum(1.0 - jnp.abs(ih - y), 0.0)  # (RC, TP)
            mc = (m_ref[i, pl.ds(c0, RC), :] if dyn
                  else m_ref[i, 0:RC, :])
            tmp = jax.lax.dot_general(                    # mc @ Rx
                mc, Rx,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)                           # (RC, TP)
            return jnp.sum(Ry * tmp, axis=0, keepdims=True)

        if RC == H:
            o_ref[i:i + 1, :] = chunk(0, False)
        else:
            base = ((n * NB + i) * nt + t) * 2
            lo = bounds_ref[base]
            hi = bounds_ref[base + 1]
            lo_al = (lo // RC) * RC
            n_ch = jnp.maximum(-(-(hi - lo_al) // RC), 0)

            def body(j, acc, lo_al=lo_al):
                return acc + chunk(lo_al + j * RC, True)

            o_ref[i:i + 1, :] = jax.lax.fori_loop(
                0, n_ch, body, jnp.zeros((1, TP), jnp.float32))


def _bwd_kernel(y_ref, x_ref, g_ref, dm_ref, *, H, W, TP, mask_dtype):
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        dm_ref[...] = jnp.zeros_like(dm_ref)

    # grad precision follows the mask dtype: bf16 masks (mixed-precision
    # losses) take the single-pass MXU path with fp32 accumulation; fp32
    # masks keep the exact multi-pass contraction
    if mask_dtype == jnp.float32:
        dt, prec = jnp.float32, jax.lax.Precision.HIGHEST
    else:
        dt, prec = jnp.bfloat16, jax.lax.Precision.DEFAULT
    ih = jax.lax.broadcasted_iota(jnp.int32, (H, TP), 0).astype(jnp.float32)
    iw = jax.lax.broadcasted_iota(jnp.int32, (W, TP), 0).astype(jnp.float32)
    for i in range(NB):
        y = y_ref[i:i + 1, :]
        x = x_ref[i:i + 1, :]
        g = g_ref[i:i + 1, :]                             # (1, TP) fp32
        Ry = jnp.maximum(1.0 - jnp.abs(ih - y), 0.0)
        Rx = jnp.maximum(1.0 - jnp.abs(iw - x), 0.0)
        # dm[h, w] = sum_p Ry[h, p] g[p] Rx[w, p]: contract TP
        dm_ref[i] += jax.lax.dot_general(
            Ry.astype(dt), (g * Rx).astype(dt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)


def _prep(masks, points, pad_rows=False):
    """Pad N to a multiple of NB and P to a multiple of PS_TILE; coords to
    grid space with -7 (all-zero-weight) padding. With `pad_rows`, also pad
    H to a multiple of PS_RC (zero rows contribute nothing) so the banded
    forward's aligned dynamic row slices stay in bounds."""
    N, H, W = masks.shape
    P = points.shape[1]
    y = points[..., 1].astype(jnp.float32) * H - 0.5
    x = points[..., 0].astype(jnp.float32) * W - 0.5
    N_pad = -(-N // NB) * NB
    P_pad = -(-P // PS_TILE) * PS_TILE
    if P_pad != P:
        pad = ((0, 0), (0, P_pad - P))
        y = jnp.pad(y, pad, constant_values=-7.0)
        x = jnp.pad(x, pad, constant_values=-7.0)
    if N_pad != N:
        pad = ((0, N_pad - N), (0, 0))
        y = jnp.pad(y, pad, constant_values=-7.0)
        x = jnp.pad(x, pad, constant_values=-7.0)
        masks = jnp.pad(masks, ((0, N_pad - N), (0, 0), (0, 0)))
    if pad_rows and H > PS_RC and H % PS_RC:
        masks = jnp.pad(masks, ((0, 0), (0, -H % PS_RC), (0, 0)))
    return masks, y, x, N_pad, P_pad


def _tile_bounds(y, H, TP):
    """Per-(mask, point-tile) corner-row bounds [lo, hi) for the banded
    forward, flat int32 (see `ops/msda_pallas._row_bounds` for the sentinel
    conventions: an all-padding tile yields hi=0 -> zero chunks)."""
    N_pad, P_pad = y.shape
    yt = y.reshape(N_pad, P_pad // TP, TP)
    live = (yt > -1.0) & (yt < H)
    ymin = jnp.min(jnp.where(live, yt, jnp.inf), axis=-1)
    ymax = jnp.max(jnp.where(live, yt, -jnp.inf), axis=-1)
    lo = jnp.clip(jnp.floor(ymin), 0, H - 1).astype(jnp.int32)
    hi = jnp.clip(jnp.floor(ymax) + 2.0, 0, H).astype(jnp.int32)
    return jnp.stack([lo, hi], axis=-1).reshape(-1)


def sort_points_by_y(points: jax.Array) -> jax.Array:
    """Sort each mask's points by row (ascending y), carrying x — one
    `lax.sort` pass, no gathers. Point-loss reductions (dice, BCE, matching
    costs) are permutation-invariant over points, so callers can pre-sort
    to make the banded kernel's per-tile row bands narrow."""
    y = points[..., 1]
    x = points[..., 0]
    y_s, x_s = jax.lax.sort((y, x), dimension=-1, num_keys=1)
    return jnp.stack([x_s, y_s], axis=-1)


@partial(jax.custom_vjp, nondiff_argnums=())
def point_sample_pallas(masks: jax.Array, points: jax.Array) -> jax.Array:
    """masks (N, H, W), points (N, P, 2) xy in [0,1] -> (N, P) fp32.

    grad_points is ZERO by definition (see module docstring)."""
    out, _ = _fwd(masks, points)
    return out


def _fwd(masks, points):
    N, H, W = masks.shape
    P = points.shape[1]
    TP = PS_TILE
    m_pad, y, x, N_pad, P_pad = _prep(masks, points, pad_rows=True)
    H_pad = m_pad.shape[1]
    bounds = _tile_bounds(y, H, TP)
    out = pl.pallas_call(
        partial(_fwd_kernel, H=H, W=W, TP=TP),
        out_shape=jax.ShapeDtypeStruct((N_pad, P_pad), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N_pad // NB, P_pad // TP),
            in_specs=[
                pl.BlockSpec((NB, TP), lambda n, t, *_: (n, t)),
                pl.BlockSpec((NB, TP), lambda n, t, *_: (n, t)),
                pl.BlockSpec((NB, H_pad, W), lambda n, t, *_: (n, 0, 0)),
            ],
            out_specs=pl.BlockSpec((NB, TP), lambda n, t, *_: (n, t)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=PS_VMEM),
    )(bounds, y, x, m_pad)
    return out[:N, :P], (masks, points)


def _bwd(res, g):
    masks, points = res
    N, H, W = masks.shape
    P = points.shape[1]
    TP = PS_TILE
    m_pad, y, x, N_pad, P_pad = _prep(masks, points)
    gq = g.astype(jnp.float32)
    gq = jnp.pad(gq, ((0, N_pad - N), (0, P_pad - P)))
    dm = pl.pallas_call(
        partial(_bwd_kernel, H=H, W=W, TP=TP, mask_dtype=masks.dtype),
        out_shape=jax.ShapeDtypeStruct((N_pad, H, W), jnp.float32),
        grid=(N_pad // NB, P_pad // TP),
        in_specs=[
            pl.BlockSpec((NB, TP), lambda n, t: (n, t)),
            pl.BlockSpec((NB, TP), lambda n, t: (n, t)),
            pl.BlockSpec((NB, TP), lambda n, t: (n, t)),
        ],
        out_specs=pl.BlockSpec((NB, H, W), lambda n, t: (n, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=PS_VMEM),
    )(y, x, gq)
    return dm[:N].astype(masks.dtype), jnp.zeros_like(points)


point_sample_pallas.defvjp(_fwd, _bwd)

_PS_PALLAS = os.environ.get("VITADAPTER_POINT_SAMPLE_PALLAS", "1") == "1"


def use_pallas_point_sample() -> bool:
    return _PS_PALLAS and jax.default_backend() == "tpu"
