#!/usr/bin/env python
"""Component-level profile of the flagship model on the attached TPU chip.

Times (axon methodology: fori_loop with carry dependence + scalar fetch):
  * full eval forward (the bench path)
  * backbone only / pixel decoder only
  * MSDA kernels at pixel-decoder + adapter shapes (fwd, dV, dgrid)
  * train step (fwd+bwd) of one MSDA op

Usage: python tools/profile_flagship.py [--skip-model]
"""

import argparse
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


def timed_loop(fn, args, n=10):
    """fn(*args, carry) -> scalar contribution; returns ms/iter."""
    @jax.jit
    def run(*a):
        def body(i, c):
            return c + fn(*a, c) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    float(run(*args))
    t0 = time.perf_counter()
    s = float(run(*args))
    assert np.isfinite(s)
    return (time.perf_counter() - t0) / n * 1e3


def profile_kernels():
    from vitadapter.ops import msda_pallas as mp

    k = jax.random.PRNGKey(0)
    cases = {
        "pixel-decoder (B4 M32 Lq5376 3lvl)": (
            ((64, 64), (32, 32), (16, 16)), 4, 5376, 32, 32),
        "adapter extractor (B4 M16 Lq5376 1lvl 32x32)": (
            ((32, 32),), 4, 5376, 16, 64),
    }
    for name, (shapes, B, Lq, M, D) in cases.items():
        S = sum(h * w for h, w in shapes)
        L = len(shapes)
        value = jax.random.normal(k, (B, S, M, D), jnp.bfloat16)
        loc = jax.random.uniform(k, (B, Lq, M, L, 4, 2))
        attn = jax.random.uniform(k, (B, Lq, M, L, 4))
        g = jax.random.normal(k, (B, Lq, M * D), jnp.float32)

        def fwd(v, l, a, gg, c):
            vv = (v + c * 0.0).astype(v.dtype)
            return jnp.sum(mp._forward(vv, shapes, l, a).astype(jnp.float32))

        def dv(v, l, a, gg, c):
            return jnp.sum(mp._grad_value_pallas(
                shapes, v.shape, l, a, gg + c * 0.0))

        def dgrid(v, l, a, gg, c):
            vv = (v + c * 0.0).astype(v.dtype)
            dl, da = mp._grad_grid_pallas(shapes, vv, l, a, gg)
            return jnp.sum(dl) + jnp.sum(da)

        def full_bwd(v, l, a, gg, c):
            vv = (v + c * 0.0).astype(v.dtype)
            gr = jax.grad(lambda x: jnp.sum(
                mp.ms_deform_attn_pallas(x, shapes, l, a).astype(
                    jnp.float32) ** 2))(vv)
            return jnp.sum(gr.astype(jnp.float32))

        print(f"--- {name} ---")
        for tag, f in (("fwd", fwd), ("dV", dv), ("dgrid", dgrid),
                       ("fwd+bwd", full_bwd)):
            try:
                ms = timed_loop(f, (value, loc, attn, g))
                print(f"  {tag:8s} {ms:8.2f} ms")
            except Exception as e:
                print(f"  {tag:8s} ERR {str(e)[:120]}")


def profile_model():
    from vitadapter.data.preprocess import normalize
    from vitadapter.zoo import mask2former_vit_adapter

    model = mask2former_vit_adapter("large", dtype=jnp.bfloat16)
    raw = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (4, 512, 512, 3), np.uint8))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), normalize(raw, dtype=jnp.bfloat16))

    def full(v, r, c):
        img = normalize(r, dtype=jnp.bfloat16)
        img = img + (c * 0).astype(img.dtype)
        return model.apply(v, img).astype(jnp.float32).mean()

    def backbone(v, r, c):
        img = normalize(r, dtype=jnp.bfloat16)
        img = img + (c * 0).astype(img.dtype)
        feats = model.backbone.apply(
            {"params": v["params"]["backbone"],
             "batch_stats": v["batch_stats"]["backbone"]}, img)
        return sum(f.astype(jnp.float32).mean() for f in feats)

    print("--- flagship (ViT-Adapter-L M2F 512px bf16 eval) ---")
    for tag, f in (("full", full), ("backbone", backbone)):
        try:
            ms = timed_loop(f, (variables, raw))
            print(f"  {tag:9s} {ms:8.1f} ms/batch4  "
                  f"({4 / ms * 1e3:.2f} img/s)")
        except Exception as e:
            print(f"  {tag:9s} ERR {str(e)[:120]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-model", action="store_true")
    a = ap.parse_args()
    profile_kernels()
    if not a.skip_model:
        profile_model()
