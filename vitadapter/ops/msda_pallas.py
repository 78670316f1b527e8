"""Pallas TPU kernel for multi-scale deformable attention sampling.

The gather formulation runs at ~10 GB/s effective on v5e (tiny random
slices); this kernel reformulates bilinear sampling as fused contractions
that live on the MXU/VPU instead:

    out[t, :] = sum_h Wy[t, h] * sum_w Wx[t, w] * V[h, w, :]

where Wy (T, H) and Wx (T, W) are the 2-sparse bilinear one-hot matrices
built in-kernel from floor/frac coordinates (attention weights folded into
Wx). Per (batch*head, query-tile) program: (T, H) x (H, Wc*D) MXU matmuls
over W-chunks + a VPU weighted reduction. Out-of-bounds samples vanish
automatically (their one-hot rows are all-zero), reproducing grid_sample
zero padding.

Backward reuses the XLA block-gather VJP (identical math); dedicated
backward kernels are a later optimization.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vitadapter.ops.msda import (SpatialShapes, level_start_index,
                                 ms_deform_attn_block)

TILE = 1024            # samples per program; TILE/128 must be divisible by 8
CHUNK_COLS = 512       # W*D columns of V contracted per MXU step


def _sample_kernel(y0_ref, x0_ref, wy_ref, wx_ref, v_ref, o_ref,
                   *, H, W, D, T):
    # y0/x0 (1, T, 1) fp32 (integer-valued); wy/wx (1, T, 2) fp32;
    # v (1, H, W*D); o (1, T, D) fp32
    y0 = y0_ref[0]          # (T, 1)
    x0 = x0_ref[0]
    wy = wy_ref[0]
    wx = wx_ref[0]
    dt = v_ref.dtype
    # fp32 operands need full-precision MXU passes for exact bilinear parity
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (T, H), 1).astype(jnp.float32)
    Wy = jnp.where(iota_h == y0, wy[:, 0:1],
                   jnp.where(iota_h == y0 + 1.0, wy[:, 1:2], 0.0)).astype(dt)

    cols = W * D
    n_chunks = max(1, -(-cols // CHUNK_COLS))
    cc = cols // n_chunks
    wc = cc // D  # W positions per chunk
    # E expands per-w weights to per-column: E[w, w*D + d] = 1
    iw = jax.lax.broadcasted_iota(jnp.int32, (wc, cc), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (wc, cc), 1)
    E = (iw == ic // D).astype(jnp.float32)
    # R folds columns back to D: R[c, d] = (c % D == d)
    rc = jax.lax.broadcasted_iota(jnp.int32, (cc, D), 0)
    rd = jax.lax.broadcasted_iota(jnp.int32, (cc, D), 1)
    Rf = (rc % D == rd).astype(jnp.float32)
    hiprec = jax.lax.Precision.HIGHEST
    fold_dt = jnp.float32 if dt == jnp.float32 else dt
    Ef = E.astype(fold_dt)
    Rm = Rf.astype(fold_dt)

    iota_wc = jax.lax.broadcasted_iota(jnp.int32, (T, wc), 1)

    def chunk_body(c, acc):
        vc = v_ref[0, :, pl.ds(c * cc, cc)]            # (H, cc)
        tmp = jnp.dot(Wy, vc, preferred_element_type=jnp.float32,
                      precision=prec)
        wg = (iota_wc + c * wc).astype(jnp.float32)
        wxc = jnp.where(wg == x0, wx[:, 0:1],
                        jnp.where(wg == x0 + 1.0, wx[:, 1:2], 0.0))
        wxd = jnp.dot(wxc.astype(fold_dt), Ef,
                      preferred_element_type=jnp.float32, precision=prec)
        weighted = (tmp * wxd).astype(fold_dt)
        acc = acc + jnp.dot(weighted, Rm,
                            preferred_element_type=jnp.float32,
                            precision=prec if dt == jnp.float32 else
                            jax.lax.Precision.DEFAULT)
        return acc

    acc = jax.lax.fori_loop(0, n_chunks, chunk_body,
                            jnp.zeros((T, D), jnp.float32))
    o_ref[0] = acc.astype(o_ref.dtype)


def _sample_kernel_onehot(y0_ref, x0_ref, wy_ref, wx_ref, v_ref, o_ref,
                          *, H, W, D, T, G):
    """Small-level variant (H*W <= 1024): one (T, HW) combined one-hot and a
    single K=HW matmul — avoids the poorly-utilized tiny-K chunk matmuls.

    Processes G (batch*head) slices per program to amortize fixed per-program
    costs; iota fields are shared across the group.
    """
    dt = v_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    HW = H * W
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, HW), 1)
    h_of = (iota // W).astype(jnp.float32)
    w_of = (iota % W).astype(jnp.float32)

    def body(g, _):
        y0 = y0_ref[g]
        x0 = x0_ref[g]
        wy = wy_ref[g]
        wx = wx_ref[g]
        eq_y0 = h_of == y0
        eq_y1 = h_of == y0 + 1.0
        eq_x0 = w_of == x0
        eq_x1 = w_of == x0 + 1.0
        C = (jnp.where(eq_y0 & eq_x0, wy[:, 0:1] * wx[:, 0:1], 0.0)
             + jnp.where(eq_y0 & eq_x1, wy[:, 0:1] * wx[:, 1:2], 0.0)
             + jnp.where(eq_y1 & eq_x0, wy[:, 1:2] * wx[:, 0:1], 0.0)
             + jnp.where(eq_y1 & eq_x1, wy[:, 1:2] * wx[:, 1:2], 0.0))
        o_ref[g] = jnp.dot(C.astype(dt), v_ref[g],
                           preferred_element_type=jnp.float32,
                           precision=prec).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, G, body, 0)


ONEHOT_MAX_HW = 1024


def _sample_level_pallas(value_bm: jax.Array, loc: jax.Array,
                         attn_w: jax.Array, H: int, W: int) -> jax.Array:
    """value_bm (BM, H, W*D); loc (B, Lq, M, P, 2); attn (B, Lq, M, P).

    Returns (B, Lq, M, D) fp32.
    """
    B, Lq, M, P, _ = loc.shape
    BM = value_bm.shape[0]
    D = value_bm.shape[-1] // W
    n = Lq * P
    T = TILE

    locf = loc.astype(jnp.float32)
    x = locf[..., 0] * W - 0.5
    y = locf[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    a = attn_w.astype(jnp.float32)
    wy = jnp.stack([1 - ly, ly], -1)                    # (B, Lq, M, P, 2)
    wx = jnp.stack([(1 - lx) * a, lx * a], -1)

    def to_bm(t):
        t = jnp.moveaxis(t, 2, 1)                        # (B, M, Lq, P, ...)
        return t.reshape((BM, n) + t.shape[4:])

    y0b = to_bm(y0[..., None])   # float32, integer-valued
    x0b = to_bm(x0[..., None])
    wyb = to_bm(wy)
    wxb = to_bm(wx)

    n_pad = -(-n // T) * T
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        y0b = jnp.pad(y0b, pad, constant_values=-7)
        x0b = jnp.pad(x0b, pad, constant_values=-7)
        wyb = jnp.pad(wyb, pad)
        wxb = jnp.pad(wxb, pad)

    out_dt = (jnp.float32 if value_bm.dtype == jnp.float32 else value_bm.dtype)
    if H * W <= ONEHOT_MAX_HW:
        # G>1 grouping was measured neutral (kernel is compute-bound, not
        # program-overhead-bound); keep 1 for the smallest VMEM footprint
        G = 1
        kernel = partial(_sample_kernel_onehot, H=H, W=W, D=D, T=T, G=G)
        v_in = value_bm.reshape(BM, H * W, D)
        v_spec = pl.BlockSpec((G, H * W, D), lambda b, t: (b, 0, 0))
    else:
        G = 1
        kernel = partial(_sample_kernel, H=H, W=W, D=D, T=T)
        v_in = value_bm
        v_spec = pl.BlockSpec((1, H, W * D), lambda b, t: (b, 0, 0))
    grid = (BM // G, n_pad // T)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BM, n_pad, D), out_dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, T, 1), lambda b, t: (b, t, 0)),
            pl.BlockSpec((G, T, 1), lambda b, t: (b, t, 0)),
            pl.BlockSpec((G, T, 2), lambda b, t: (b, t, 0)),
            pl.BlockSpec((G, T, 2), lambda b, t: (b, t, 0)),
            v_spec,
        ],
        out_specs=pl.BlockSpec((G, T, D), lambda b, t: (b, t, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(y0b, x0b, wyb, wxb, v_in)

    out = out[:, :n].reshape(B, M, Lq, P, D).astype(jnp.float32).sum(axis=3)
    return out.transpose(0, 2, 1, 3)  # (B, Lq, M, D)


def _forward(value, spatial_shapes: SpatialShapes, sampling_locations,
             attention_weights):
    B, S, M, D = value.shape
    Lq = sampling_locations.shape[1]
    starts = level_start_index(spatial_shapes)
    out = jnp.zeros((B, Lq, M, D), jnp.float32)
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = jax.lax.slice_in_dim(value, starts[lvl], starts[lvl] + H * W,
                                 axis=1)
        vm = v.reshape(B, H, W, M, D).transpose(0, 3, 1, 2, 4)
        vm = vm.reshape(B * M, H, W * D)
        out = out + _sample_level_pallas(
            vm, sampling_locations[:, :, :, lvl],
            attention_weights[:, :, :, lvl], H, W)
    return out.reshape(B, Lq, M * D).astype(value.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas(value, spatial_shapes: SpatialShapes,
                          sampling_locations, attention_weights):
    """MSDA sampling via the Pallas contraction kernel (forward); backward
    runs the XLA block-gather VJP (identical math)."""
    return _forward(value, spatial_shapes, sampling_locations,
                    attention_weights)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = _forward(value, spatial_shapes, sampling_locations,
                   attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, res, g):
    value, loc, attn = res
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn_block(v, spatial_shapes, l, a),
        value, loc, attn)
    return vjp(g)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
