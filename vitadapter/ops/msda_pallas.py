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

Backward: grad_value via a dedicated Pallas contraction kernel (`_dv_kernel`,
fp32-accumulating, scatter-free); grad wrt locations/weights via the XLA VJP
of the gather-only block formulation.
"""

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vitadapter.ops.msda import (SpatialShapes, level_start_index,
                                 ms_deform_attn_block)

TILE = 1024            # samples per program; TILE/128 must be divisible by 8
CHUNK_COLS = 512       # W*D columns of V contracted per MXU step (forward)
DV_CHUNK_COLS = 256    # chunk width for the grad_value kernel (see _dv_kernel)
# v5e has 128M VMEM; the default 16M scoped-vmem cap is too tight for the
# (T, HW) one-hot intermediates at HW=1024 (bf16 needs ~18M live)
VMEM_LIMIT = 64 * 1024 * 1024


def _n_col_chunks(cols: int, D: int, target: int) -> int:
    """Number of W*D-column chunks for the in-kernel fori_loop.

    A valid chunk width must (a) divide `cols` exactly, (b) cover whole W
    positions (multiple of D), and (c) keep the pl.ds start offsets provably
    128-lane aligned (Mosaic rejects dynamic starts that are not static
    multiples of 128). Returns the chunk count whose width is closest to
    `target` among valid ones; 1 (no slicing — start 0 is always aligned)
    when none exists, e.g. odd W*D.
    """
    best = 1
    for n in range(2, cols // max(D, 1) + 1):
        if cols % n:
            continue
        cc = cols // n
        if cc % D or cc % 128:
            continue
        if abs(cc - target) < abs(cols // best - target):
            best = n
    return best
# escape hatch: set VITADAPTER_MSDA_PFOLD=0 to route small levels through the
# per-sample chunked kernel instead of the P-folded one-hot kernel
_PFOLD = os.environ.get("VITADAPTER_MSDA_PFOLD", "1") == "1"


def _level_chunk(H: int, W: int, target: int) -> int:
    """Flat chunk length for a (H, W) level: whole rows, divides H*W, and
    128-aligned so the anchored dynamic-start slices stay sublane-legal.
    Falls back to the full level (single chunk, no banding) when no aligned
    row count exists (e.g. odd detection map widths)."""
    HW = H * W
    for rows in range(max(1, target // W), 0, -1):
        cl = rows * W
        if HW % cl == 0 and cl % 128 == 0:
            return cl
    return HW


def _norm_segments(Lq: int, query_segments) -> Tuple[int, ...]:
    """Validate/normalize the optional query-segment structure."""
    if not query_segments:
        return None
    segs = tuple(int(s) for s in query_segments)
    return segs if sum(segs) == Lq and all(s > 0 for s in segs) else None


def _pad_segments(t: jax.Array, segs, T: int, cv=0.0) -> jax.Array:
    """(BM, Lq, K) -> (BM, sum_ceil, K): pad each segment to a T multiple so
    every query tile is segment-pure (a tile mixing pyramid levels has a
    near-full sampling band; pure tiles keep bands narrow)."""
    parts = []
    s = 0
    for seg in segs:
        p = -(-seg // T) * T
        part = t[:, s:s + seg]
        if p != seg:
            part = jnp.pad(part, ((0, 0), (0, p - seg), (0, 0)),
                           constant_values=cv)
        parts.append(part)
        s += seg
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _unpad_segments(out: jax.Array, segs, T: int) -> jax.Array:
    """Inverse of `_pad_segments` along axis 1."""
    parts = []
    ps = 0
    for seg in segs:
        parts.append(out[:, ps:ps + seg])
        ps += -(-seg // T) * T
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


# tile size for the segmented (grid-structured-queries) path: smaller tiles
# span fewer raster rows -> narrower bands (measured optimum at the
# pixel-decoder geometry: 256 = 22.6 ms vs 512 = 29.2 ms vs old 30.9 ms)
SEG_TILE = int(os.environ.get("VITADAPTER_MSDA_SEG_TILE", "256"))


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
    n_chunks = _n_col_chunks(cols, D, CHUNK_COLS)
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


def _sample_kernel_onehot_pf(y_ref, x_ref, a_ref, v_ref, o_ref,
                             *, H, W, D, T, P):
    """Small-level variant (H*W small): all P points of a query are folded
    into ONE combined (T, HW) one-hot row (bilinear sampling is linear, so
    point contributions add), and the program tiles queries rather than
    samples — 4x fewer programs, ONE K=HW matmul per tile instead of P, and
    no P-sum epilogue.

    The bilinear one-hot weight of grid cell (h, w) for continuous sample
    coordinate (y, x) is exactly relu(1-|h-y|) * relu(1-|w-x|): two nonzero
    entries per axis at floor/ceil with weights (1-frac, frac), zero weight
    for out-of-range coordinates (= grid_sample zero padding). This pure
    arithmetic form avoids vector compares entirely — Mosaic on v5e rejects
    bf16 `cmpf` AND i1-mask relayouts into 16-bit selects (round-1/2
    regressions) — and the compute stays fp32 where the fraction lives, so
    no coordinate precision is lost. Only the accumulated (T, HW) C tensor
    is stored in the value dtype (fp32 C at HW=1024 blows scoped VMEM).

    Block shapes: y/x/a (1, T, P) fp32 — continuous grid coords + attention
    weight per point; v (1, HW, D); o (1, T, D).
    """
    dt = v_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    HW = H * W
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, HW), 1)
    h_of = (iota // W).astype(jnp.float32)
    w_of = (iota - (iota // W) * W).astype(jnp.float32)
    y = y_ref[0]
    x = x_ref[0]
    a = a_ref[0]
    C = jnp.zeros((T, HW), dt)
    for p in range(P):
        wy = jnp.maximum(1.0 - jnp.abs(h_of - y[:, p:p + 1]), 0.0)
        wx = jnp.maximum(1.0 - jnp.abs(w_of - x[:, p:p + 1]), 0.0)
        C = C + (wy * wx * a[:, p:p + 1]).astype(dt)
    o_ref[0] = jnp.dot(C, v_ref[0], preferred_element_type=jnp.float32,
                       precision=prec).astype(o_ref.dtype)


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

    out_dt = (jnp.float32 if value_bm.dtype == jnp.float32 else value_bm.dtype)
    onehot_max = ONEHOT_MAX_HW
    if _PFOLD and H * W <= onehot_max:
        # per-QUERY tiling: all P points folded into one one-hot row
        def to_bmq(t):
            t = jnp.moveaxis(t, 2, 1)                    # (B, M, Lq, ...)
            return t.reshape((BM, Lq, -1))

        yq = to_bmq(y)              # (BM, Lq, P) continuous grid coords
        xq = to_bmq(x)
        aq = to_bmq(a)              # (BM, Lq, P) attention weights
        nq_pad = -(-Lq // T) * T
        if nq_pad != Lq:
            pad = ((0, 0), (0, nq_pad - Lq), (0, 0))
            yq = jnp.pad(yq, pad, constant_values=-7)
            xq = jnp.pad(xq, pad, constant_values=-7)
            aq = jnp.pad(aq, pad)
        out = pl.pallas_call(
            partial(_sample_kernel_onehot_pf, H=H, W=W, D=D, T=T, P=P),
            out_shape=jax.ShapeDtypeStruct((BM, nq_pad, D), out_dt),
            grid=(BM, nq_pad // T),
            in_specs=[
                pl.BlockSpec((1, T, P), lambda b, t: (b, t, 0)),
                pl.BlockSpec((1, T, P), lambda b, t: (b, t, 0)),
                pl.BlockSpec((1, T, P), lambda b, t: (b, t, 0)),
                pl.BlockSpec((1, H * W, D), lambda b, t: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, T, D), lambda b, t: (b, t, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=VMEM_LIMIT),
        )(yq, xq, aq, value_bm.reshape(BM, H * W, D))
        out = out[:, :Lq].reshape(B, M, Lq, D).astype(jnp.float32)
        return out.transpose(0, 2, 1, 3)  # (B, Lq, M, D)

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

    out = pl.pallas_call(
        partial(_sample_kernel, H=H, W=W, D=D, T=T),
        out_shape=jax.ShapeDtypeStruct((BM, n_pad, D), out_dt),
        grid=(BM, n_pad // T),
        in_specs=[
            pl.BlockSpec((1, T, 1), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, T, 1), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, T, 2), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, T, 2), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, H, W * D), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, D), lambda b, t: (b, t, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=VMEM_LIMIT),
    )(y0b, x0b, wyb, wxb, value_bm)

    out = out[:, :n].reshape(B, M, Lq, P, D).astype(jnp.float32).sum(axis=3)
    return out.transpose(0, 2, 1, 3)  # (B, Lq, M, D)


def _fwd_ml_kernel(bounds_ref, y_ref, x_ref, a_ref, v_ref, o_ref,
                   *, shapes, D, T, P, chunk, G=1):
    """Unified multi-level P-folded forward: ONE program per (batch*head,
    query-tile) covers ALL levels and points, chunking the flattened
    (level, h, w) axis so the (T, chunk) one-hot intermediates stay
    VMEM-bounded at any level size. Replaces three per-level kernel
    dispatches (plus their XLA add/transpose epilogues) with one program
    family — ~6x fewer programs at pixel-decoder geometry and half the VPU
    work of the per-sample path on big levels.

    Deformable sampling is LOCAL: a query tile's points touch a narrow row
    band of each level, so most K-chunks of the one-hot contraction are
    all-zero. `bounds_ref` (scalar-prefetched SMEM, FLAT (BM*n_tiles*2L,)
    int32 — a multi-dim SMEM operand is tile-padded and blows the 1M SMEM
    budget at flagship BM) carries each tile's per-level [lo, hi)
    flat-index row bounds
    (computed host-side from the sampling coords, attention-masked);
    chunks outside the band are skipped with `pl.when` — the dominant VPU
    cost (the relu one-hot builds) simply never runs for them.

    Bilinear weights via the compare-free relu identity (see
    `_sample_kernel_onehot_pf`). Block shapes: y/x/a (1, T, L*P) fp32 with
    level l point p at column l*P+p; v (1, S, D) value dtype (S = sum HW);
    o (1, T, D) fp32, accumulated in place across chunks.
    """
    dt = v_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    bm = pl.program_id(0)
    ti = pl.program_id(1)
    nt = pl.num_programs(1)
    L = len(shapes)
    for g in range(G):
        # head-folded dispatch: one program covers G consecutive (batch*head)
        # rows (blocks are 4-D with G as an untiled leading dim, so every
        # outer array stays a pure reshape of the (BM, ...) layout). Program
        # dispatch costs ~1.8us each (null-kernel probe: 4.8ms for 2688
        # programs with NO body) — folding G=8 cuts that 8x while the
        # per-head band bounds keep the executed VPU work identical.
        base = ((bm * G + g) * nt + ti) * (2 * L)
        y = y_ref[0, g]
        x = x_ref[0, g]
        a = a_ref[0, g]
        o_ref[0, g] = jnp.zeros_like(o_ref[0, g])
        start = 0
        for lvl, (H, W) in enumerate(shapes):
            HW = H * W
            chunk_l = _level_chunk(H, W, chunk)
            lo = bounds_ref[base + 2 * lvl]
            hi = bounds_ref[base + 2 * lvl + 1]
            # chunks ANCHORED at the tile's band start (dynamic,
            # chunk-aligned): executed chunk count == ceil(band/chunk)
            # regardless of where the band sits, vs fixed-position chunks
            # whose granularity made the skip ineffective (a 17-row band
            # straddling 16-row chunks ran 2-3)
            lo_al = (lo // chunk_l) * chunk_l

            # chunk-invariant index pattern: the (h, w) decomposition of a
            # chunk-aligned window repeats every chunk, so only a scalar
            # row offset varies per chunk (saves the iota/div/mul-sub chain
            # in every executed chunk)
            iota0 = jax.lax.broadcasted_iota(jnp.int32, (T, chunk_l), 1)
            hof0 = iota0 // W
            h_of0 = hof0.astype(jnp.float32)
            w_of0 = (iota0 - hof0 * W).astype(jnp.float32)
            # the column one-hot is chunk-invariant (chunks are whole rows,
            # so w_of repeats identically every chunk): build
            # wxa_p = relu(1 - |w_of - x_p|) * a_p ONCE per level and reuse
            # it in every executed chunk — the per-chunk VPU work drops from
            # 11 to 6 ops/element (the one-hot build is the kernel's
            # measured bottleneck: fp32 VPU peak, see the band-matmul
            # study). Single-chunk levels (chunk_l == HW, e.g. odd det
            # widths) skip the hoist: there is nothing to reuse and the
            # P x (T, HW) fp32 residents blow the scoped-VMEM budget.
            hoist = chunk_l != HW
            if hoist:
                wxa = [jnp.maximum(
                    1.0 - jnp.abs(w_of0 - x[:, (lvl * P + p):(lvl * P + p)
                                            + 1]), 0.0)
                    * a[:, (lvl * P + p):(lvl * P + p) + 1]
                    for p in range(P)]
            else:
                wxa = None

            def step(c0, dyn, lvl=lvl, W=W, start=start, chunk_l=chunk_l,
                     y=y, x=x, a=a, g=g, h_of0=h_of0, w_of0=w_of0, wxa=wxa):
                h_of = h_of0 + (c0 // W)
                C = jnp.zeros((T, chunk_l), jnp.float32)
                for p in range(P):
                    col = lvl * P + p
                    wy = jnp.maximum(1.0 - jnp.abs(h_of - y[:, col:col + 1]),
                                     0.0)
                    if wxa is not None:
                        C = C + wy * wxa[p]
                    else:
                        wx = jnp.maximum(
                            1.0 - jnp.abs(w_of0 - x[:, col:col + 1]), 0.0)
                        C = C + wy * wx * a[:, col:col + 1]
                if dyn:
                    vc = v_ref[0, g, pl.ds(start + c0, chunk_l), :]
                else:
                    vc = v_ref[0, g, start + c0:start + c0 + chunk_l, :]
                o_ref[0, g] += jnp.dot(C.astype(dt), vc,
                                       preferred_element_type=jnp.float32,
                                       precision=prec).astype(o_ref.dtype)

            if chunk_l == HW:
                # single-chunk level (no 128-aligned row chunking exists):
                # static slice — a traced-start pl.ds of unaligned length is
                # not sublane-legal in Mosaic
                @pl.when(lo < hi)
                def _():
                    step(0, False)
            else:
                # DYNAMIC trip count: iterate only the band's actual chunks.
                # The previous fixed-trip fori_loop over ALL HW//chunk
                # positions with a pl.when guard per iteration cost ~400
                # cycles per SKIPPED iteration — measured as ~23 ms of pure
                # overhead at pixel-decoder geometry (empty-bounds probe),
                # i.e. the entire kernel time. A traced upper bound lowers
                # to a hardware while loop whose skipped iterations simply
                # never issue.
                n_ch = jnp.maximum((hi - lo_al + chunk_l - 1) // chunk_l, 0)

                def body(i, _, chunk_l=chunk_l, lo_al=lo_al, step=step):
                    step(lo_al + i * chunk_l, True)
                    return 0

                jax.lax.fori_loop(0, n_ch, body, 0)
            start += HW


def _row_bounds(yq, shapes, T):
    """Per (bm, tile, level) [lo, hi) flat-index row bounds of the touched
    sampling band. yq: (BM, nq_pad, L*P) fp32 grid y-coords. A sample at
    continuous y touches rows floor(y)..floor(y)+1; one with y outside
    (-1, H) has zero bilinear weight on EVERY row, so it contributes
    nothing to the output or any gradient (incl. dattn) and is excluded —
    this geometric criterion (NOT attention masking: dattn is nonzero even
    where a == 0) also drops the query padding (coords -7). Tiles with no
    in-range point get lo >= hi for multi-chunk levels (skips every
    chunk)."""
    BM, nq_pad, LP = yq.shape
    L = len(shapes)
    P = LP // L
    yt = yq.reshape(BM, nq_pad // T, T, L, P)
    bounds = []
    for lvl, (H, W) in enumerate(shapes):
        yl = yt[..., lvl, :]
        live = (yl > -1.0) & (yl < H)
        ymin = jnp.min(jnp.where(live, yl, jnp.inf), axis=(2, 3))
        ymax = jnp.max(jnp.where(live, yl, -jnp.inf), axis=(2, 3))
        r0 = jnp.clip(jnp.floor(ymin), 0, H - 1)
        r1 = jnp.clip(jnp.floor(ymax) + 1, 0, H - 1)
        bounds.append((r0 * W).astype(jnp.int32))          # inf -> lo=(H-1)W
        bounds.append(((r1 + 1) * W).astype(jnp.int32))    # -inf -> hi=W
    # FLAT (BM*nt*2L,) — multi-dim scalar-prefetch operands are tile-padded
    # in SMEM (1M budget); flat 1-D stays at true size
    return jnp.stack(bounds, axis=-1).reshape(-1)


# target flat chunk length (whole rows, see `_level_chunk`): small chunks +
# anchored starts make the executed work track the actual band size
ML_CHUNK = int(os.environ.get("VITADAPTER_MSDA_ML_CHUNK", "256"))
BWD_ML_CHUNK = int(os.environ.get("VITADAPTER_MSDA_BWD_CHUNK", "256"))
# value budget for keeping the whole multi-level tensor VMEM-resident per
# program; above this fall back to the per-level kernels
ML_MAX_VALUE_BYTES = 8 * 1024 * 1024
# heads folded per program in the fused ML forward (dispatch amortization);
# the effective G is the largest divisor of M <= ML_FOLD whose value block
# fits ML_FOLD_VMEM (lane-padded estimate)
ML_FOLD = int(os.environ.get("VITADAPTER_MSDA_FOLD", "8"))
ML_FOLD_VMEM = int(os.environ.get("VITADAPTER_MSDA_FOLD_VMEM",
                                  str(24 * 1024 * 1024)))
_ML = os.environ.get("VITADAPTER_MSDA_ML", "1") == "1"
# band-matmul forward (EXPERIMENTAL, default off): moves the per-point
# (T, chunk) one-hot outer product onto the MXU via a (W, H*D) value layout
# (see `_fwd_ml_bandmm_kernel`). Parity-validated on chip (fp32 2e-7 / bf16
# 6e-3) but measured SLOWER than the flat path at pixel-decoder geometry
# (31.7 vs 26.9 ms) — the theoretical ~2x VPU cut is eaten by the dynamic
# lane slicing, the (P*T, rowsD) staging traffic, and the fori carry. Kept
# env-gated for future Mosaic generations.
_BANDMM = os.environ.get("VITADAPTER_MSDA_BANDMM", "0") == "1"


def _bandmm_mode(H: int, W: int, D: int, chunk: int) -> bool:
    """Per-level static path choice for the band-matmul forward.

    VPU cost per executed chunk per point: band-matmul ~6 ops on
    (T, rows*D) vs flat ~11 ops on (T, rows*W) -> band-matmul wins when
    6*D < 11*W. Also requires a 128-aligned (rows*D) lane stride for the
    dynamic value slice and actual row chunking to exist."""
    chunk_l = _level_chunk(H, W, chunk)
    rows = chunk_l // W
    return (chunk_l != H * W and (rows * D) % 128 == 0
            and 6 * D < 11 * W)


def _fwd_ml_bandmm_kernel(bounds_ref, y_ref, x_ref, a_ref, *refs,
                          shapes, D, T, P, chunk, G, modes):
    """Band-matmul multi-level forward (MXU-shifted one-hots).

    The flat kernel's dominant cost is VPU: ~11 elementwise ops per
    (query, grid-cell, point) building the bilinear one-hot C before one
    MXU dot. This kernel never materializes C. Per level in band-matmul
    mode, the value is pre-transposed host-side to (W, H*D) so that for
    each row chunk [r0, r0+rows):

        u_p   = relu(1-|w-x_p|) * a_p          (T, W)      VPU, per level
        S_p   = u_p @ V2[:, r0*D:(r0+rows)*D]  (T, rows*D) MXU
        A    += relu(1-|rd//D + r0 - y_p|)*S_p (T, rows*D) VPU (~6 ops)
        out  += A @ tile(eye(D), rows)         (T, D)      MXU, constant

    which is algebraically the same bilinear sum (the wy factor is applied
    after the w-contraction; the block-identity dot folds the row axis).
    VPU work per chunk-point drops from 11*(rows*W) to ~6*(rows*D) — ~2x at
    pixel-decoder geometry where D=32, W=64 — and the (W, H*D) layout also
    kills the 4x lane-padding of the (S, D=32) value block. Levels where
    6*D >= 11*W (e.g. 16x16 at D=32) keep the flat path (refs carry one
    value array per level, in that level's chosen layout).
    """
    dt = refs[0].dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    bm = pl.program_id(0)
    ti = pl.program_id(1)
    nt = pl.num_programs(1)
    L = len(shapes)
    v_refs = refs[:L]
    o_ref = refs[L]
    for g in range(G):
        base = ((bm * G + g) * nt + ti) * (2 * L)
        y = y_ref[0, g]
        x = x_ref[0, g]
        a = a_ref[0, g]
        acc = jnp.zeros((T, D), jnp.float32)
        for lvl, (H, W) in enumerate(shapes):
            chunk_l = _level_chunk(H, W, chunk)
            lo = bounds_ref[base + 2 * lvl]
            hi = bounds_ref[base + 2 * lvl + 1]
            vr = v_refs[lvl]
            if modes[lvl]:
                rows = chunk_l // W
                rowsD = rows * D
                # row-unit bounds (the flat bounds are multiples of W)
                ro_lo = lo // W
                ro_hi = hi // W
                c0_al = ro_lo // rows        # first chunk index
                n_ch = jnp.maximum(
                    -(-(ro_hi - c0_al * rows) // rows), 0)
                w_of = jax.lax.broadcasted_iota(
                    jnp.int32, (T, W), 1).astype(jnp.float32)
                rd_of = (jax.lax.broadcasted_iota(jnp.int32, (T, rowsD), 1)
                         // D).astype(jnp.float32)
                # block-identity tile(eye(D), rows) built from iotas (a
                # captured np constant is not a legal kernel operand),
                # compare-free: integer |k%D - d| >= 1 except on the
                # diagonal, so the relu identity yields exact {0, 1}
                ik = jax.lax.broadcasted_iota(jnp.int32, (rowsD, D), 0)
                idd = jax.lax.broadcasted_iota(jnp.int32, (rowsD, D), 1)
                msum = jnp.maximum(
                    1.0 - jnp.abs(((ik % D) - idd).astype(jnp.float32)),
                    0.0)
                # the P points' w-one-hots stacked along sublanes: ONE
                # (P*T, W) x (W, rowsD) dot per chunk instead of P small
                # ones (dot issue overhead dominated the first cut)
                us = []
                for p in range(P):
                    col = lvl * P + p
                    wx = jnp.maximum(
                        1.0 - jnp.abs(w_of - x[:, col:col + 1]), 0.0)
                    us.append((wx * a[:, col:col + 1]).astype(dt))
                U = jnp.concatenate(us, axis=0)              # (P*T, W)

                def bstep(j, A_, c0_al=c0_al, rows=rows, rowsD=rowsD,
                          vr=vr, U=U, y=y, lvl=lvl, rd_of=rd_of, g=g):
                    ci = c0_al + j
                    # index expressed as chunk_index * block_len so Mosaic
                    # can prove 128-alignment of the lane offset
                    v2c = vr[0, g, :, pl.ds(ci * rowsD, rowsD)]  # (W, rowsD)
                    S = jax.lax.dot_general(
                        U, v2c,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec)                       # (P*T, rowsD)
                    r0f = (ci * rows).astype(jnp.float32)
                    for p in range(P):
                        col = lvl * P + p
                        wy = jnp.maximum(
                            1.0 - jnp.abs(rd_of
                                          - (y[:, col:col + 1] - r0f)),
                            0.0)
                        A_ = A_ + wy * S[p * T:(p + 1) * T]
                    return A_

                # the block-identity reduction distributes over the chunk
                # sum -> ONE msum dot per level, hoisted out of the loop.
                # dtype-matched precision: fp32 mode needs HIGHEST (DEFAULT
                # rounds the fp32 accumulator into the MXU at bf16 —
                # measured 2e-3 end-to-end); bf16 mode tolerates it
                A = jax.lax.fori_loop(
                    0, n_ch, bstep, jnp.zeros((T, rowsD), jnp.float32))
                acc = acc + jax.lax.dot_general(
                    A, msum,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec)
            else:
                # flat one-hot path for this level (value block (HW, D))
                iota = jax.lax.broadcasted_iota(jnp.int32, (T, chunk_l), 1)
                hof0 = iota // W
                h_of0 = hof0.astype(jnp.float32)
                w_of = (iota - hof0 * W).astype(jnp.float32)

                def fstep(c0, dyn, lvl=lvl, W=W, chunk_l=chunk_l,
                          y=y, x=x, a=a, g=g, vr=vr, h_of0=h_of0,
                          w_of=w_of):
                    h_of = h_of0 + (c0 // W)
                    C = jnp.zeros((T, chunk_l), jnp.float32)
                    for p in range(P):
                        col = lvl * P + p
                        wy = jnp.maximum(
                            1.0 - jnp.abs(h_of - y[:, col:col + 1]), 0.0)
                        wx = jnp.maximum(
                            1.0 - jnp.abs(w_of - x[:, col:col + 1]), 0.0)
                        C = C + wy * wx * a[:, col:col + 1]
                    if dyn:
                        vc = vr[0, g, pl.ds(c0, chunk_l), :]
                    else:
                        vc = vr[0, g, 0:chunk_l, :]
                    return jnp.dot(C.astype(dt), vc,
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

                if chunk_l == H * W:
                    acc = acc + jnp.where(
                        lo < hi, 1.0, 0.0) * fstep(0, False)
                else:
                    lo_al = (lo // chunk_l) * chunk_l
                    n_ch = jnp.maximum(
                        (hi - lo_al + chunk_l - 1) // chunk_l, 0)

                    def body(i, acc_, chunk_l=chunk_l, lo_al=lo_al,
                             fstep=fstep):
                        return acc_ + fstep(lo_al + i * chunk_l, True)

                    acc = jax.lax.fori_loop(0, n_ch, body, acc)
        o_ref[0, g] = acc.astype(o_ref.dtype)


def _pick_tile(Lq: int) -> int:
    """Query-tile size minimizing padding waste (ties -> bigger tiles =
    fewer programs). E.g. Lq=5376 pads 14% at T=1024 but divides exactly
    at T=896. All candidates keep fp32 (T, ML_CHUNK) intermediates within
    the raised scoped-vmem cap."""
    best, best_pad = TILE, -(-Lq // TILE) * TILE
    # candidates capped at 1024: the fused backward holds ~20 (T, chunk)
    # fp32 temporaries live, and T=1536+ blows the 64M scoped-vmem cap
    for t in (512, 640, 768, 896, 1024):
        padded = -(-Lq // t) * t
        if padded < best_pad or (padded == best_pad and t > best):
            best, best_pad = t, padded
    return best


def _forward_ml(value, spatial_shapes: SpatialShapes, sampling_locations,
                attention_weights, query_segments=None):
    B, S, M, D = value.shape
    Lq = sampling_locations.shape[1]
    L = len(spatial_shapes)
    P = sampling_locations.shape[4]
    BM = B * M
    segs = _norm_segments(Lq, query_segments)
    T = SEG_TILE if segs else _pick_tile(Lq)

    locf = sampling_locations.astype(jnp.float32)
    hw = jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)
    # continuous grid coords per (level, point): loc * (W, H) - 0.5
    xy = locf * hw[None, None, None, :, None, :] - 0.5   # (B,Lq,M,L,P,2)
    att = attention_weights.astype(jnp.float32)

    def to_bmq(t):                                       # (B,Lq,M,LP)
        t = t.reshape(B, Lq, M, L * P)
        return jnp.moveaxis(t, 2, 1).reshape(BM, Lq, L * P)

    xq = to_bmq(xy[..., 0])
    yq = to_bmq(xy[..., 1])
    aq = to_bmq(att)
    if segs:
        yq = _pad_segments(yq, segs, T, cv=-7)
        xq = _pad_segments(xq, segs, T, cv=-7)
        aq = _pad_segments(aq, segs, T)
        nq_pad = yq.shape[1]
    else:
        nq_pad = -(-Lq // T) * T
        if nq_pad != Lq:
            pad = ((0, 0), (0, nq_pad - Lq), (0, 0))
            yq = jnp.pad(yq, pad, constant_values=-7)
            xq = jnp.pad(xq, pad, constant_values=-7)
            aq = jnp.pad(aq, pad)
    vm = value.transpose(0, 2, 1, 3).reshape(BM, S, D)
    bounds = _row_bounds(yq, spatial_shapes, T)

    # head folding: G consecutive (batch*head) rows per program (see
    # `_fwd_ml_kernel`). Capped by a VMEM estimate — the value block is
    # lane-padded to 128 AND double-buffered by Pallas across grid steps,
    # so it occupies 2*G*S*128*itemsize resident bytes (measured: G=8 at
    # pixdec fp32 = 22 MB/buffer blew the 64 MB scoped-vmem cap at 70 MB).
    G = min(ML_FOLD, M)
    lanes = max(D, 128)   # the value block is lane-padded to 128
    while G > 1 and (M % G
                     or 2 * G * S * lanes * value.dtype.itemsize
                     > ML_FOLD_VMEM):
        G -= 1

    out = pl.pallas_call(
        partial(_fwd_ml_kernel, shapes=tuple(spatial_shapes), D=D, T=T, P=P,
                chunk=ML_CHUNK, G=G),
        out_shape=jax.ShapeDtypeStruct((BM // G, G, nq_pad, D), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BM // G, nq_pad // T),
            in_specs=[
                pl.BlockSpec((1, G, T, L * P), lambda b, t, *_: (b, 0, t, 0)),
                pl.BlockSpec((1, G, T, L * P), lambda b, t, *_: (b, 0, t, 0)),
                pl.BlockSpec((1, G, T, L * P), lambda b, t, *_: (b, 0, t, 0)),
                pl.BlockSpec((1, G, S, D), lambda b, t, *_: (b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, G, T, D), lambda b, t, *_: (b, 0, t, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=VMEM_LIMIT),
    )(bounds, yq.reshape(BM // G, G, nq_pad, L * P),
      xq.reshape(BM // G, G, nq_pad, L * P),
      aq.reshape(BM // G, G, nq_pad, L * P),
      vm.reshape(BM // G, G, S, D))
    out = out.reshape(BM, nq_pad, D)
    out = _unpad_segments(out, segs, T) if segs else out[:, :Lq]
    out = out.reshape(B, M, Lq, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Lq, M * D).astype(value.dtype)


def _forward_ml_bandmm(value, spatial_shapes: SpatialShapes,
                       sampling_locations, attention_weights,
                       query_segments=None):
    """Multi-level forward via `_fwd_ml_bandmm_kernel` (MXU-shifted
    one-hots). Same contract as `_forward_ml`; the value ships as one array
    per level — (W, H*D) transposed for band-matmul levels, (H*W, D) flat
    otherwise."""
    B, S, M, D = value.shape
    Lq = sampling_locations.shape[1]
    L = len(spatial_shapes)
    P = sampling_locations.shape[4]
    BM = B * M
    segs = _norm_segments(Lq, query_segments)
    T = SEG_TILE if segs else _pick_tile(Lq)

    locf = sampling_locations.astype(jnp.float32)
    hw = jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)
    xy = locf * hw[None, None, None, :, None, :] - 0.5

    def to_bmq(t):
        t = t.reshape(B, Lq, M, L * P)
        return jnp.moveaxis(t, 2, 1).reshape(BM, Lq, L * P)

    xq = to_bmq(xy[..., 0])
    yq = to_bmq(xy[..., 1])
    aq = to_bmq(attention_weights.astype(jnp.float32))
    if segs:
        yq = _pad_segments(yq, segs, T, cv=-7)
        xq = _pad_segments(xq, segs, T, cv=-7)
        aq = _pad_segments(aq, segs, T)
        nq_pad = yq.shape[1]
    else:
        nq_pad = -(-Lq // T) * T
        if nq_pad != Lq:
            pad = ((0, 0), (0, nq_pad - Lq), (0, 0))
            yq = jnp.pad(yq, pad, constant_values=-7)
            xq = jnp.pad(xq, pad, constant_values=-7)
            aq = jnp.pad(aq, pad)
    vm = value.transpose(0, 2, 1, 3).reshape(BM, S, D)
    bounds = _row_bounds(yq, spatial_shapes, T)

    modes = tuple(_bandmm_mode(H, W, D, ML_CHUNK)
                  for H, W in spatial_shapes)
    # VMEM gate for the head fold: per-g resident value bytes under the
    # per-level layouts ((W, H*D) has no lane padding; flat pads D to 128),
    # double-buffered by Pallas
    per_g = sum((H * W * D if m else H * W * max(D, 128))
                for (H, W), m in zip(spatial_shapes, modes))
    per_g *= value.dtype.itemsize
    G = min(ML_FOLD, M)
    while G > 1 and (M % G or 2 * G * per_g > ML_FOLD_VMEM):
        G -= 1

    v_ops = []
    in_specs = [
        pl.BlockSpec((1, G, T, L * P), lambda b, t, *_: (b, 0, t, 0)),
        pl.BlockSpec((1, G, T, L * P), lambda b, t, *_: (b, 0, t, 0)),
        pl.BlockSpec((1, G, T, L * P), lambda b, t, *_: (b, 0, t, 0)),
    ]
    start = 0
    for (H, W), m in zip(spatial_shapes, modes):
        vl = vm[:, start:start + H * W, :]
        if m:
            v2 = vl.reshape(BM // G, G, H, W, D).transpose(0, 1, 3, 2, 4)
            v_ops.append(v2.reshape(BM // G, G, W, H * D))
            in_specs.append(pl.BlockSpec((1, G, W, H * D),
                                         lambda b, t, *_: (b, 0, 0, 0)))
        else:
            v_ops.append(vl.reshape(BM // G, G, H * W, D))
            in_specs.append(pl.BlockSpec((1, G, H * W, D),
                                         lambda b, t, *_: (b, 0, 0, 0)))
        start += H * W

    out = pl.pallas_call(
        partial(_fwd_ml_bandmm_kernel, shapes=tuple(spatial_shapes), D=D,
                T=T, P=P, chunk=ML_CHUNK, G=G, modes=modes),
        out_shape=jax.ShapeDtypeStruct((BM // G, G, nq_pad, D), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BM // G, nq_pad // T),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, G, T, D), lambda b, t, *_: (b, 0, t, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=VMEM_LIMIT),
    )(bounds, yq.reshape(BM // G, G, nq_pad, L * P),
      xq.reshape(BM // G, G, nq_pad, L * P),
      aq.reshape(BM // G, G, nq_pad, L * P),
      *v_ops)
    out = out.reshape(BM, nq_pad, D)
    out = _unpad_segments(out, segs, T) if segs else out[:, :Lq]
    out = out.reshape(B, M, Lq, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Lq, M * D).astype(value.dtype)


def _forward(value, spatial_shapes: SpatialShapes, sampling_locations,
             attention_weights, query_segments=None):
    B, S, M, D = value.shape
    if _ML and S * D * value.dtype.itemsize <= ML_MAX_VALUE_BYTES:
        if _BANDMM and any(_bandmm_mode(H, W, D, ML_CHUNK)
                           for H, W in spatial_shapes):
            return _forward_ml_bandmm(value, spatial_shapes,
                                      sampling_locations, attention_weights,
                                      query_segments)
        return _forward_ml(value, spatial_shapes, sampling_locations,
                           attention_weights, query_segments)
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


@partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def ms_deform_attn_pallas(value, spatial_shapes: SpatialShapes,
                          sampling_locations, attention_weights,
                          query_segments=None):
    """MSDA sampling via the Pallas contraction kernel (forward); backward
    computes grad_value with a Pallas MXU contraction (fp32 accumulate, no
    scatter — deterministic, unlike the CUDA atomicAdd col2im in reference
    `ms_deform_im2col_cuda.cuh:846-922`) and grad wrt sampling locations /
    attention weights via the XLA VJP of the gather-only block formulation.

    `query_segments` (static tuple summing to Lq, optional): declares that
    the queries are a concatenation of raster-ordered pyramid levels; each
    segment is padded to its own tile boundary so row-band skipping sees
    level-pure tiles (pure perf hint — the math is unchanged)."""
    return _forward(value, spatial_shapes, sampling_locations,
                    attention_weights, query_segments)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights,
         query_segments=None):
    out = _forward(value, spatial_shapes, sampling_locations,
                   attention_weights, query_segments)
    return out, (value, sampling_locations, attention_weights)


def _dv_kernel(y0_ref, x0_ref, wy_ref, wx_ref, g_ref, dv_ref, *, H, W, D, T):
    """grad_value accumulation: dV += Wy^T @ (WxD ⊙ repeat(g)).

    Replaces the XLA scatter-add (the CUDA kernel's atomicAdd col2im path,
    reference `ms_deform_im2col_cuda.cuh:846-922`) with an MXU contraction;
    deterministic by construction. Output block is revisited across query
    tiles (accumulate), zero-initialized at t == 0.
    """
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    y0 = y0_ref[0]
    x0 = x0_ref[0]
    wy = wy_ref[0]
    wx = wx_ref[0]
    g = g_ref[0]            # (T, D) fp32
    dt = dv_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (T, H), 1).astype(jnp.float32)
    Wy = jnp.where(iota_h == y0, wy[:, 0:1],
                   jnp.where(iota_h == y0 + 1.0, wy[:, 1:2], 0.0))
    cols = W * D
    # narrower chunks than the forward: the accumulating out block is VMEM-
    # resident on top of the chunk temporaries
    n_chunks = _n_col_chunks(cols, D, DV_CHUNK_COLS)
    cc = cols // n_chunks
    wc = cc // D
    iw = jax.lax.broadcasted_iota(jnp.int32, (wc, cc), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (wc, cc), 1)
    E = (iw == ic // D).astype(jnp.float32)
    # replicate g across W positions via a matmul (pltpu.repeat on a D<128
    # array pads every repeat unit to a full 128-lane tile -> VMEM OOM)
    ird = jax.lax.broadcasted_iota(jnp.int32, (D, cc), 0)
    irc = jax.lax.broadcasted_iota(jnp.int32, (D, cc), 1)
    Rrep = (ird == irc % D).astype(jnp.float32)
    g_rep = jnp.dot(g, Rrep, preferred_element_type=jnp.float32,
                    precision=prec)       # (T, cc): [g g ... g]
    iota_wc = jax.lax.broadcasted_iota(jnp.int32, (T, wc), 1)

    def chunk_body(c, _):
        wg = (iota_wc + c * wc).astype(jnp.float32)
        wxc = jnp.where(wg == x0, wx[:, 0:1],
                        jnp.where(wg == x0 + 1.0, wx[:, 1:2], 0.0))
        wxd = jnp.dot(wxc, E, preferred_element_type=jnp.float32,
                      precision=prec)
        # contract over T: dV_chunk[h, c] = sum_t Wy[t, h] * rhs[t, c]
        rhs = (wxd * g_rep).astype(dt)
        contrib = jax.lax.dot_general(
            Wy.astype(dt), rhs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # (H, cc)
        cur = dv_ref[0, :, pl.ds(c * cc, cc)]
        dv_ref[0, :, pl.ds(c * cc, cc)] = (
            cur + contrib.astype(dv_ref.dtype))
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def _grad_value_pallas(spatial_shapes, value_shape, loc, attn, g):
    """Assemble grad_value via per-level dV kernels. g: (B, Lq, M*D) fp32."""
    B, S, M, D = value_shape
    Lq = loc.shape[1]
    T = TILE
    g4 = g.reshape(B, Lq, M, D).astype(jnp.float32)
    parts = []
    for lvl, (H, W) in enumerate(spatial_shapes):
        locl = loc[:, :, :, lvl].astype(jnp.float32)
        attl = attn[:, :, :, lvl].astype(jnp.float32)
        P = locl.shape[3]
        n = Lq * P
        x = locl[..., 0] * W - 0.5
        y = locl[..., 1] * H - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0
        ly = y - y0
        wy = jnp.stack([1 - ly, ly], -1)
        wx = jnp.stack([(1 - lx) * attl, lx * attl], -1)

        BM = B * M

        def to_bm(t):
            t = jnp.moveaxis(t, 2, 1)
            return t.reshape((BM, n) + t.shape[4:])

        y0b = to_bm(y0[..., None])
        x0b = to_bm(x0[..., None])
        wyb = to_bm(wy)
        wxb = to_bm(wx)
        # g per sample: repeat each query's grad across its P points
        gb = jnp.moveaxis(g4, 2, 1).reshape(BM, Lq, 1, D)
        gb = jnp.broadcast_to(gb, (BM, Lq, P, D)).reshape(BM, n, D)

        n_pad = -(-n // T) * T
        if n_pad != n:
            pad3 = ((0, 0), (0, n_pad - n), (0, 0))
            y0b = jnp.pad(y0b, pad3, constant_values=-7)
            x0b = jnp.pad(x0b, pad3, constant_values=-7)
            wyb = jnp.pad(wyb, pad3)
            wxb = jnp.pad(wxb, pad3)
            gb = jnp.pad(gb, pad3)

        dv = pl.pallas_call(
            partial(_dv_kernel, H=H, W=W, D=D, T=T),
            out_shape=jax.ShapeDtypeStruct((BM, H, W * D), jnp.float32),
            grid=(BM, n_pad // T),
            in_specs=[
                pl.BlockSpec((1, T, 1), lambda b, t: (b, t, 0)),
                pl.BlockSpec((1, T, 1), lambda b, t: (b, t, 0)),
                pl.BlockSpec((1, T, 2), lambda b, t: (b, t, 0)),
                pl.BlockSpec((1, T, 2), lambda b, t: (b, t, 0)),
                pl.BlockSpec((1, T, D), lambda b, t: (b, t, 0)),
            ],
            out_specs=pl.BlockSpec((1, H, W * D), lambda b, t: (b, 0, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=VMEM_LIMIT),
        )(y0b, x0b, wyb, wxb, gb)
        # (BM, H, W*D) -> (B, H*W, M, D)
        dv = dv.reshape(B, M, H, W, D).transpose(0, 2, 3, 1, 4)
        parts.append(dv.reshape(B, H * W, M, D))
    return jnp.concatenate(parts, axis=1)


def _dgrid_kernel(y0_ref, x0_ref, wp_ref, g_ref, v_ref, o_ref,
                  *, H, W, D, T):
    """grad wrt sampling locations / attention weights: three separable
    contractions per sample sharing the forward kernel's structure
    (reference CUDA computes the same bilinear derivatives inline,
    `ms_deform_im2col_cuda.cuh:766-844`):

        dattn = g . (Wy  (x) wxn) V        wxn = attention-less x weights
        dlx   = g . (Wy  (x) wxd) V        wxd = attn*W * [-1, +1]
        dly   = g . (Wyd (x) wxn) V        Wyd = attn*H * [-1, +1] one-hot

    wp (1, T, 8) fp32: [wy0, wy1, wyd0, wyd1, wxn0, wxn1, wxd0, wxd1]
    (scales folded host-side); o (1, T, 4) fp32: [dattn, dlx, dly, 0].
    """
    y0 = y0_ref[0]
    x0 = x0_ref[0]
    wp = wp_ref[0]
    g = g_ref[0]            # (T, D) fp32
    dt = v_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (T, H), 1).astype(jnp.float32)
    Wy = jnp.where(iota_h == y0, wp[:, 0:1],
                   jnp.where(iota_h == y0 + 1.0, wp[:, 1:2], 0.0)).astype(dt)
    Wyd = jnp.where(iota_h == y0, wp[:, 2:3],
                    jnp.where(iota_h == y0 + 1.0, wp[:, 3:4], 0.0)).astype(dt)
    cols = W * D
    n_chunks = _n_col_chunks(cols, D, DV_CHUNK_COLS)
    cc = cols // n_chunks
    wc = cc // D
    iw = jax.lax.broadcasted_iota(jnp.int32, (wc, cc), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (wc, cc), 1)
    E = (iw == ic // D).astype(jnp.float32)
    ird = jax.lax.broadcasted_iota(jnp.int32, (D, cc), 0)
    irc = jax.lax.broadcasted_iota(jnp.int32, (D, cc), 1)
    Rrep = (ird == irc % D).astype(jnp.float32)
    g_rep = jnp.dot(g, Rrep, preferred_element_type=jnp.float32,
                    precision=prec)       # (T, cc): [g g ... g]
    iota_wc = jax.lax.broadcasted_iota(jnp.int32, (T, wc), 1)

    def chunk_body(c, acc):
        vc = v_ref[0, :, pl.ds(c * cc, cc)]             # (H, cc)
        tmp = jnp.dot(Wy, vc, preferred_element_type=jnp.float32,
                      precision=prec)
        tmpd = jnp.dot(Wyd, vc, preferred_element_type=jnp.float32,
                       precision=prec)
        wg = (iota_wc + c * wc).astype(jnp.float32)
        wxn = jnp.where(wg == x0, wp[:, 4:5],
                        jnp.where(wg == x0 + 1.0, wp[:, 5:6], 0.0))
        wxd = jnp.where(wg == x0, wp[:, 6:7],
                        jnp.where(wg == x0 + 1.0, wp[:, 7:8], 0.0))
        wxnD = jnp.dot(wxn, E, preferred_element_type=jnp.float32,
                       precision=prec)                  # (T, cc)
        wxdD = jnp.dot(wxd, E, preferred_element_type=jnp.float32,
                       precision=prec)
        gn = wxnD * g_rep
        da = jnp.sum(tmp * gn, axis=1, keepdims=True)
        dx = jnp.sum(tmp * (wxdD * g_rep), axis=1, keepdims=True)
        dy = jnp.sum(tmpd * gn, axis=1, keepdims=True)
        upd = jnp.concatenate([da, dx, dy, jnp.zeros_like(da)], axis=1)
        return acc + upd

    acc = jax.lax.fori_loop(0, n_chunks, chunk_body,
                            jnp.zeros((T, 4), jnp.float32))
    o_ref[0] = acc


def _grad_grid_pallas(spatial_shapes, value, loc, attn, g):
    """grad wrt (sampling_locations, attention_weights) via per-level
    _dgrid_kernel programs. g: (B, Lq, M*D) fp32."""
    B, S, M, D = value.shape
    Lq = loc.shape[1]
    T = TILE
    starts = level_start_index(spatial_shapes)
    g4 = g.reshape(B, Lq, M, D).astype(jnp.float32)
    BM = B * M
    dloc_parts = []
    dattn_parts = []
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = jax.lax.slice_in_dim(value, starts[lvl], starts[lvl] + H * W,
                                 axis=1)
        vm = v.reshape(B, H, W, M, D).transpose(0, 3, 1, 2, 4)
        vm = vm.reshape(BM, H, W * D)
        locl = loc[:, :, :, lvl].astype(jnp.float32)
        attl = attn[:, :, :, lvl].astype(jnp.float32)
        P = locl.shape[3]
        n = Lq * P
        x = locl[..., 0] * W - 0.5
        y = locl[..., 1] * H - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0
        ly = y - y0
        aH = attl * H
        aW = attl * W
        # [wy0, wy1, wyd0, wyd1, wxn0, wxn1, wxd0, wxd1]
        wp = jnp.stack([1 - ly, ly, -aH, aH, 1 - lx, lx, -aW, aW], -1)

        def to_bm(t):
            t = jnp.moveaxis(t, 2, 1)
            return t.reshape((BM, n) + t.shape[4:])

        y0b = to_bm(y0[..., None])
        x0b = to_bm(x0[..., None])
        wpb = to_bm(wp)
        gb = jnp.moveaxis(g4, 2, 1).reshape(BM, Lq, 1, D)
        gb = jnp.broadcast_to(gb, (BM, Lq, P, D)).reshape(BM, n, D)

        n_pad = -(-n // T) * T
        if n_pad != n:
            pad3 = ((0, 0), (0, n_pad - n), (0, 0))
            y0b = jnp.pad(y0b, pad3, constant_values=-7)
            x0b = jnp.pad(x0b, pad3, constant_values=-7)
            wpb = jnp.pad(wpb, pad3)
            gb = jnp.pad(gb, pad3)

        out = pl.pallas_call(
            partial(_dgrid_kernel, H=H, W=W, D=D, T=T),
            out_shape=jax.ShapeDtypeStruct((BM, n_pad, 4), jnp.float32),
            grid=(BM, n_pad // T),
            in_specs=[
                pl.BlockSpec((1, T, 1), lambda b, t: (b, t, 0)),
                pl.BlockSpec((1, T, 1), lambda b, t: (b, t, 0)),
                pl.BlockSpec((1, T, 8), lambda b, t: (b, t, 0)),
                pl.BlockSpec((1, T, D), lambda b, t: (b, t, 0)),
                pl.BlockSpec((1, H, W * D), lambda b, t: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, T, 4), lambda b, t: (b, t, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=VMEM_LIMIT),
        )(y0b, x0b, wpb, gb, vm)
        out = out[:, :n].reshape(B, M, Lq, P, 4).transpose(0, 2, 1, 3, 4)
        dattn_parts.append(out[..., 0])                   # (B, Lq, M, P)
        dloc_parts.append(out[..., 1:3])                  # (B, Lq, M, P, 2)
    dattn = jnp.stack(dattn_parts, axis=3).astype(attn.dtype)
    dloc = jnp.stack(dloc_parts, axis=3).astype(loc.dtype)
    return dloc, dattn


# escape hatch: set VITADAPTER_MSDA_PALLAS_DGRID=0 to compute dloc/dattn via
# the XLA VJP of the block formulation instead of the Pallas kernel
_PALLAS_DGRID = os.environ.get("VITADAPTER_MSDA_PALLAS_DGRID", "1") == "1"


def _bwd_ml_kernel(bounds_ref, y_ref, x_ref, a_ref, g_ref, v_ref,
                   dv_ref, dg_ref, dg_s, *, shapes, D, T, P, chunk):
    """Fused multi-level backward: ONE program family produces grad_value
    AND the dattn/dloc reductions, sharing the bilinear one-hot builds and
    the per-chunk Gv = g @ V^T contraction that the split `_dv_kernel` /
    `_dgrid_kernel` pair each recomputed (the CUDA reference likewise
    computes all three gradients in one col2im pass,
    `ms_deform_im2col_cuda.cuh:766-922`).

    Per level chunk:
        Gv   = g @ vc^T                        (T, hwc)
        per point p: wy/wx relu one-hots; C += a_p * wy * wx
            dattn_p += rowsum(wy * wx * Gv)
            dly_p   += rowsum(masked-sign_y * wx * Gv)   [x a_p * H host-side]
            dlx_p   += rowsum(wy * masked-sign_x * Gv)   [x a_p * W host-side]
        dv_chunk += C^T @ g                    (accumulated across tiles)

    Chunks outside the tile's sampled row band (`bounds_ref`, see
    `_fwd_ml_kernel`) are skipped with `pl.when`; the per-point reductions
    therefore accumulate in a VMEM scratch `dg_s` (T, 3*L*P) instead of
    register carries, so predication is pure ref side effects.

    Blocks: y/x/a (1, T, L*P) fp32; g (1, T, D) fp32; v (1, S, D);
    dv (1, S, D) fp32 revisited across the (sequential) tile axis;
    dg (1, T, 3*L*P) fp32 with columns [dattn | dlx | dly] per (l, p).
    """
    bm = pl.program_id(0)
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dg_s[...] = jnp.zeros_like(dg_s)
    y = y_ref[0]
    x = x_ref[0]
    a = a_ref[0]
    g = g_ref[0]                    # (T, D) fp32
    dt = v_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    LP = len(shapes) * P
    gd = g.astype(dt)
    base = (bm * pl.num_programs(1) + t_idx) * (2 * len(shapes))
    start = 0
    for lvl, (H, W) in enumerate(shapes):
        HW = H * W
        chunk_l = _level_chunk(H, W, chunk)
        lo = bounds_ref[base + 2 * lvl]
        hi = bounds_ref[base + 2 * lvl + 1]
        lo_al = (lo // chunk_l) * chunk_l

        # chunk-invariant column factors (chunks are whole rows, so w_of
        # repeats identically every chunk): build wx_p and its derivative
        # tap sx_p ONCE per level — the one-hot build is the VPU bottleneck
        # (see `_fwd_ml_kernel`), and this removes the x half of it from
        # every executed chunk. Skipped for single-chunk levels
        # (chunk_l == HW): nothing to reuse, and the 2P x (T, HW) fp32
        # residents blow the scoped-VMEM budget at odd det widths.
        iota0 = jax.lax.broadcasted_iota(jnp.int32, (T, chunk_l), 1)
        hof0 = iota0 // W
        h_of0 = hof0.astype(jnp.float32)
        w_of0 = (iota0 - hof0 * W).astype(jnp.float32)
        hoist = chunk_l != HW
        wx_l, sx_l = [], []
        if hoist:
            for p in range(P):
                col = lvl * P + p
                dxr = w_of0 - x[:, col:col + 1]
                wx_l.append(jnp.maximum(1.0 - jnp.abs(dxr), 0.0))
                # floor-convention derivative taps: -1 on (h-y) in (-1, 0],
                # +1 on (0, 1] — BOTH taps stay active when the coordinate
                # is exactly integral (frac 0), matching the reference's
                # lh/hh bilinear derivatives (`ms_deform_im2col_cuda.cuh:
                # 766-844`). A sign()-based mask would zero both taps there,
                # and bf16-quantized locations land on integers often.
                sx_l.append(jnp.where((dxr > -1.0) & (dxr <= 1.0),
                                      jnp.where(dxr > 0.0, 1.0, -1.0), 0.0))

        def chunk_step(c0, hwc, dyn, lvl=lvl, W=W, start=start,
                       h_of0=h_of0, w_of0=w_of0, wx_l=wx_l, sx_l=sx_l):
            """One K-chunk (anchored at a dynamic start when dyn); pure ref
            side effects (dv_ref, dg_s)."""
            h_of = h_of0 + (c0 // W)
            if dyn:
                vc = v_ref[0, pl.ds(start + c0, hwc), :]      # (hwc, D)
            else:
                vc = v_ref[0, start + c0:start + c0 + hwc, :]
            Gv = jax.lax.dot_general(
                gd, vc, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            C = jnp.zeros((T, hwc), jnp.float32)
            for p in range(P):
                col = lvl * P + p
                dyr = h_of - y[:, col:col + 1]
                wy = jnp.maximum(1.0 - jnp.abs(dyr), 0.0)
                if wx_l:
                    wx = wx_l[p]
                    sx = sx_l[p]
                else:
                    dxr = w_of0 - x[:, col:col + 1]
                    wx = jnp.maximum(1.0 - jnp.abs(dxr), 0.0)
                    sx = jnp.where((dxr > -1.0) & (dxr <= 1.0),
                                   jnp.where(dxr > 0.0, 1.0, -1.0), 0.0)
                t0 = wy * wx
                C = C + t0 * a[:, col:col + 1]
                dg_s[:, col:col + 1] += jnp.sum(t0 * Gv, axis=1,
                                                keepdims=True)
                sy = jnp.where((dyr > -1.0) & (dyr <= 1.0),
                               jnp.where(dyr > 0.0, 1.0, -1.0), 0.0)
                dg_s[:, 2 * LP + col:2 * LP + col + 1] += jnp.sum(
                    (sy * wx) * Gv, axis=1, keepdims=True)
                dg_s[:, LP + col:LP + col + 1] += jnp.sum(
                    (wy * sx) * Gv, axis=1, keepdims=True)
            contrib = jax.lax.dot_general(
                C.astype(dt), gd,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            if dyn:
                cur = dv_ref[0, pl.ds(start + c0, hwc), :]
                dv_ref[0, pl.ds(start + c0, hwc), :] = cur + contrib
            else:
                cur = dv_ref[0, start + c0:start + c0 + hwc, :]
                dv_ref[0, start + c0:start + c0 + hwc, :] = cur + contrib

        if chunk_l == HW:
            # single-chunk level: static slices (see `_fwd_ml_kernel`)
            @pl.when(lo < hi)
            def _():
                chunk_step(0, HW, False)
        else:
            # lax.fori_loop keeps only one chunk's temporaries live — the
            # python-unrolled form made Mosaic hold every chunk's ~20 fp32
            # (T, chunk) arrays simultaneously (>100M scoped vmem at the
            # pixel-decoder geometry). Chunks are anchored at the tile's
            # band start and the trip count is DYNAMIC (see `_fwd_ml_kernel`:
            # fixed-trip + pl.when cost ~400 cycles per skipped iteration).
            n_ch = jnp.maximum((hi - lo_al + chunk_l - 1) // chunk_l, 0)

            def body(c, _, chunk_l=chunk_l, lo_al=lo_al):
                chunk_step(lo_al + c * chunk_l, chunk_l, True)
                return 0

            jax.lax.fori_loop(0, n_ch, body, 0)
        start += HW
    dg_ref[0] = dg_s[...]


def _backward_ml(spatial_shapes, value, loc, attn, g, query_segments=None):
    """Fused dv/dloc/dattn via `_bwd_ml_kernel`. g: (B, Lq, M*D) fp32."""
    B, S, M, D = value.shape
    Lq = loc.shape[1]
    L = len(spatial_shapes)
    P = loc.shape[4]
    BM = B * M
    segs = _norm_segments(Lq, query_segments)
    T = SEG_TILE if segs else _pick_tile(Lq)
    LP = L * P

    locf = loc.astype(jnp.float32)
    hw = jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)
    xy = locf * hw[None, None, None, :, None, :] - 0.5
    att = attn.astype(jnp.float32)

    def to_bmq(t):
        t = t.reshape(B, Lq, M, LP)
        return jnp.moveaxis(t, 2, 1).reshape(BM, Lq, LP)

    xq = to_bmq(xy[..., 0])
    yq = to_bmq(xy[..., 1])
    aq = to_bmq(att)
    g4 = g.reshape(B, Lq, M, D).astype(jnp.float32)
    gq = jnp.moveaxis(g4, 2, 1).reshape(BM, Lq, D)
    if segs:
        yq = _pad_segments(yq, segs, T, cv=-7)
        xq = _pad_segments(xq, segs, T, cv=-7)
        aq = _pad_segments(aq, segs, T)
        gq = _pad_segments(gq, segs, T)
        nq_pad = yq.shape[1]
    else:
        nq_pad = -(-Lq // T) * T
        if nq_pad != Lq:
            pad = ((0, 0), (0, nq_pad - Lq), (0, 0))
            yq = jnp.pad(yq, pad, constant_values=-7)
            xq = jnp.pad(xq, pad, constant_values=-7)
            aq = jnp.pad(aq, pad)
            gq = jnp.pad(gq, pad)
    vm = value.transpose(0, 2, 1, 3).reshape(BM, S, D)
    bounds = _row_bounds(yq, spatial_shapes, T)

    dv, dg = pl.pallas_call(
        partial(_bwd_ml_kernel, shapes=tuple(spatial_shapes), D=D, T=T, P=P,
                chunk=BWD_ML_CHUNK),
        out_shape=(jax.ShapeDtypeStruct((BM, S, D), jnp.float32),
                   jax.ShapeDtypeStruct((BM, nq_pad, 3 * LP), jnp.float32)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BM, nq_pad // T),
            in_specs=[
                pl.BlockSpec((1, T, LP), lambda b, t, *_: (b, t, 0)),
                pl.BlockSpec((1, T, LP), lambda b, t, *_: (b, t, 0)),
                pl.BlockSpec((1, T, LP), lambda b, t, *_: (b, t, 0)),
                pl.BlockSpec((1, T, D), lambda b, t, *_: (b, t, 0)),
                pl.BlockSpec((1, S, D), lambda b, t, *_: (b, 0, 0)),
            ],
            out_specs=(pl.BlockSpec((1, S, D), lambda b, t, *_: (b, 0, 0)),
                       pl.BlockSpec((1, T, 3 * LP),
                                    lambda b, t, *_: (b, t, 0))),
            scratch_shapes=[pltpu.VMEM((T, 3 * LP), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
    )(bounds, yq, xq, aq, gq, vm)

    dv = dv.reshape(B, M, S, D).transpose(0, 2, 1, 3).astype(value.dtype)
    dg = (_unpad_segments(dg, segs, T) if segs else dg[:, :Lq])
    dg = dg.reshape(B, M, Lq, 3 * LP)
    dg = jnp.moveaxis(dg, 1, 2)                        # (B, Lq, M, 3LP)
    dattn_raw = dg[..., :LP].reshape(B, Lq, M, L, P)
    dlx_raw = dg[..., LP:2 * LP].reshape(B, Lq, M, L, P)
    dly_raw = dg[..., 2 * LP:].reshape(B, Lq, M, L, P)
    # chain rule: grid coords = loc * (W, H) - 0.5; derivative includes the
    # per-point attention weight (folded host-side to keep the kernel lean)
    Wl = hw[:, 0][None, None, None, :, None]           # (1,1,1,L,1)
    Hl = hw[:, 1][None, None, None, :, None]
    dloc = jnp.stack([dlx_raw * att * Wl,
                      dly_raw * att * Hl], axis=-1)
    dattn = dattn_raw.astype(attn.dtype)
    return dv, dloc.astype(loc.dtype), dattn


def _bwd(spatial_shapes, query_segments, res, g):
    value, loc, attn = res
    B, S, M, D = value.shape
    if (_ML and _PALLAS_DGRID
            and S * D * value.dtype.itemsize <= ML_MAX_VALUE_BYTES):
        return _backward_ml(spatial_shapes, value, loc, attn,
                            g.astype(jnp.float32), query_segments)
    # all-Pallas backward: grad_value via the accumulating contraction
    # kernel (no scatter), dloc/dattn via the separable-derivative kernel
    dv = _grad_value_pallas(spatial_shapes, value.shape, loc, attn,
                            g.astype(jnp.float32)).astype(value.dtype)
    if _PALLAS_DGRID:
        dloc, dattn = _grad_grid_pallas(spatial_shapes, value, loc, attn,
                                        g.astype(jnp.float32))
    else:
        _, vjp = jax.vjp(
            lambda l, a: ms_deform_attn_block(value, spatial_shapes, l, a),
            loc, attn)
        dloc, dattn = vjp(g)
    return dv, dloc, dattn


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
