#!/usr/bin/env python
"""Dissect the MSDeformAttnPixelDecoder at flagship geometry (VERDICT r2
weak #1: the +pixel_decoder stage costs ~209 ms of the 316 ms batch-4
forward while its FLOP floor is ~22 ms).

Times each constituent op family in isolation at the exact flagship
geometry (B4, C1024, heads 32, FFN 4096, levels 64/32/16 = 5376 tokens,
stride-4 map 128x128):

  * one full encoder layer (x6 = encoder cost)
  * MSDA module (projections + Pallas kernel + glue)
  * MSDA sampling core alone (pre-projected operands)
  * MSDA projections alone (4 Dense at (B,5376,1024))
  * encoder FFN alone (1024->4096->1024)
  * LayerNorm pair alone
  * FPN tail (lateral 1x1 + 3x3 output conv + GN at 128^2)
  * full pixel decoder (cross-check against the sum)

Usage: python tools/profile_pixdec.py
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from vitadapter.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def timed(fn, args, n=10):
    @jax.jit
    def run(*a):
        def body(i, c):
            return c + fn(*a, c).astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    float(run(*args))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        s = float(run(*args))
        assert np.isfinite(s)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / n * 1e3


def main():
    from vitadapter.heads.pixel_decoder import (ConvGN,
                                                DeformableEncoderLayer,
                                                MSDeformAttnPixelDecoder)
    from vitadapter.ops.msda import MSDeformAttn, ms_deform_attn

    B, C, M, P, F = 4, 1024, 32, 4, 4096
    shapes = ((64, 64), (32, 32), (16, 16))
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    D = C // M
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, S, C), dt)
    pos0 = jnp.asarray(rng.randn(B, S, C), dt)
    refs = []
    for h, w in shapes:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        refs.append(np.stack([xx.ravel(), yy.ravel()], -1))
    ref0 = jnp.asarray(np.broadcast_to(
        np.concatenate(refs, 0)[None, :, None, :], (B, S, L, 2)),
        jnp.float32)
    segs = tuple(h * w for h, w in shapes)
    rows = []

    def report(tag, ms):
        rows.append((tag, ms))
        print(f"  {tag:34s} {ms:8.2f} ms")

    # --- one full encoder layer ---
    layer = DeformableEncoderLayer(num_heads=M, n_levels=L, n_points=P,
                                   ffn_dim=F, dtype=dt)
    lv = layer.init(jax.random.PRNGKey(0), x0, pos0, ref0, shapes)

    def run_layer(v, x, c):
        x = x + (c * 0).astype(x.dtype)
        return layer.apply(v, x, pos0, ref0, shapes).astype(jnp.float32).mean()

    report("encoder layer (x6 in model)", timed(run_layer, (lv, x0)))

    # --- MSDA module (projections + kernel + glue) ---
    attn = MSDeformAttn(d_model=C, n_levels=L, n_heads=M, n_points=P,
                        dtype=dt)
    av = attn.init(jax.random.PRNGKey(1), x0, ref0, x0, shapes)

    def run_msda(v, x, c):
        x = x + (c * 0).astype(x.dtype)
        return attn.apply(v, x, ref0, x, shapes,
                          query_segments=segs).astype(jnp.float32).mean()

    report("MSDA module (proj+kernel+glue)", timed(run_msda, (av, x0)))

    # --- MSDA sampling core alone ---
    val = jnp.asarray(rng.randn(B, S, M, D), dt)
    loc = jnp.asarray(
        ref0[:, :, None, :, None, :]
        + rng.randn(B, S, M, L, P, 2).astype(np.float32) * 0.02,
        jnp.float32)
    aw = jax.nn.softmax(
        jnp.asarray(rng.randn(B, S, M, L * P), jnp.float32)).reshape(
            B, S, M, L, P)

    def run_core(v, l, a, c):
        l = l + (c * 0).astype(l.dtype)
        return ms_deform_attn(v, shapes, l, a,
                              query_segments=segs).astype(jnp.float32).mean()

    report("MSDA sampling core (kernel)", timed(run_core, (val, loc, aw)))

    # --- MSDA projections alone ---
    class Projs(nn.Module):
        @nn.compact
        def __call__(self, q, v):
            o = nn.Dense(M * L * P * 2, dtype=dt)(q)
            a = nn.Dense(M * L * P, dtype=dt)(q)
            a = jax.nn.softmax(a.astype(jnp.float32), axis=-1)
            vv = nn.Dense(C, dtype=dt)(v)
            oo = nn.Dense(C, dtype=dt)(vv)
            return (o.astype(jnp.float32).mean() + a.mean()
                    + oo.astype(jnp.float32).mean())

    pmod = Projs()
    pv = jax.jit(pmod.init)(jax.random.PRNGKey(2), x0, x0)

    def run_projs(v, x, c):
        x = x + (c * 0).astype(x.dtype)
        return pmod.apply(v, x, x)

    report("MSDA 4 Dense projections", timed(run_projs, (pv, x0)))

    # --- encoder FFN alone ---
    class FFN(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Dense(F, dtype=dt)(x)
            y = nn.relu(y)
            return nn.Dense(C, dtype=dt)(y).astype(jnp.float32).mean()

    fmod = FFN()
    fv = jax.jit(fmod.init)(jax.random.PRNGKey(3), x0)

    def run_ffn(v, x, c):
        x = x + (c * 0).astype(x.dtype)
        return fmod.apply(v, x)

    report("encoder FFN (1024->4096->1024)", timed(run_ffn, (fv, x0)))

    # --- LayerNorm pair ---
    class LNs(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.LayerNorm()(x)
            x = nn.LayerNorm()(x)
            return x.astype(jnp.float32).mean()

    nmod = LNs()
    nv = jax.jit(nmod.init)(jax.random.PRNGKey(4), x0)

    def run_lns(v, x, c):
        x = x + (c * 0).astype(x.dtype)
        return nmod.apply(v, x)

    report("LayerNorm x2", timed(run_lns, (nv, x0)))

    # --- FPN tail at 128^2 ---
    f4 = jnp.asarray(rng.randn(B, 128, 128, C), dt)
    o8 = jnp.asarray(rng.randn(B, 64, 64, C), dt)

    class Tail(nn.Module):
        @nn.compact
        def __call__(self, f, o):
            from vitadapter.utils.resize import resize_2d
            lat = ConvGN(C, kernel=1, dtype=dt)(f)
            y = lat + resize_2d(o, lat.shape[1:3], "bilinear")
            y = ConvGN(C, kernel=3, act=True, dtype=dt)(y)
            y = nn.Conv(C, (1, 1), dtype=dt)(y)
            return y.astype(jnp.float32).mean()

    tmod = Tail()
    tv = jax.jit(tmod.init)(jax.random.PRNGKey(5), f4, o8)

    def run_tail(v, f, c):
        f = f + (c * 0).astype(f.dtype)
        return tmod.apply(v, f, o8)

    report("FPN tail (lat+3x3 conv+GN @128^2)", timed(run_tail, (tv, f4)))

    # --- full pixel decoder ---
    feats = [jnp.asarray(rng.randn(B, r, r, C), dt)
             for r in (128, 64, 32, 16)]
    pd = MSDeformAttnPixelDecoder(feat_channels=C, out_channels=C,
                                  num_heads=M, ffn_dim=F, num_feats=C // 2,
                                  dtype=dt)
    pdv = jax.jit(pd.init)(jax.random.PRNGKey(6), feats)

    def run_pd(v, f0, c):
        f0 = f0 + (c * 0).astype(f0.dtype)
        mf, mems = pd.apply(v, [f0] + feats[1:])
        return (mf.astype(jnp.float32).mean()
                + sum(m.astype(jnp.float32).mean() for m in mems))

    report("full pixel decoder", timed(run_pd, (pdv, feats[0])))

    enc6 = rows[0][1] * 6
    print(f"\n  encoder x6 extrapolated         {enc6:8.2f} ms")
    print(f"  (encoder - MSDA - FFN - 2LN)    "
          f"{rows[0][1] - rows[1][1] - rows[4][1] - rows[5][1]:8.2f} ms"
          f"  <- per-layer glue")


if __name__ == "__main__":
    main()
