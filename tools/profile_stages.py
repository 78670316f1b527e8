#!/usr/bin/env python
"""Stage-level profile of the flagship eval forward (VERDICT r2 weak #1).

Times cumulative prefixes of the pipeline (diffs give per-stage cost):
  normalize -> backbone -> +pixel_decoder -> +decoder stack -> full
plus microbenchmarks of the head's dominant raw ops at flagship geometry
(mask einsum, attention-mask resize, decoder k/v projections) to establish
the memory/compute floor of each.

Usage: python tools/profile_stages.py [--micro-only]
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
from flax import linen as nn


def timed_loop(fn, args, n=10):
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


def profile_model_stages():
    from vitadapter.data.preprocess import normalize
    from vitadapter.zoo import mask2former_vit_adapter

    model = mask2former_vit_adapter("large", dtype=jnp.bfloat16)
    raw = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (4, 512, 512, 3), np.uint8))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), normalize(raw, dtype=jnp.bfloat16))

    def img_of(r, c):
        img = normalize(r, dtype=jnp.bfloat16)
        return img + (c * 0).astype(img.dtype)

    def backbone(mdl, img):
        return sum(f.astype(jnp.float32).mean() for f in mdl.backbone(img))

    def pixdec(mdl, img):
        feats = mdl.backbone(img)
        mask_feature, memories = mdl.decode_head.pixel_decoder(feats)
        return (mask_feature.astype(jnp.float32).mean()
                + sum(m.astype(jnp.float32).mean() for m in memories))

    def head(mdl, img):
        cls_list, mask_list = mdl.decode_head(mdl.backbone(img))
        return (cls_list[-1].mean() + mask_list[-1].mean())

    def full(mdl, img):
        return mdl(img).astype(jnp.float32).mean()

    def vit_only(mdl, img):
        """ViT embed + all blocks, no adapter/SPM (MXU floor check)."""
        bb = mdl.backbone
        t, H, W = bb.vit.embed(img, deterministic=True)
        t = bb.vit.run_blocks(t, H, W, 0, len(bb.vit.blocks),
                              deterministic=True)
        return t.astype(jnp.float32).mean()

    def spm_only(mdl, img):
        return sum(c.astype(jnp.float32).mean()
                   for c in mdl.backbone.spm(img, train=False))

    stages = [("vit_only", vit_only), ("spm_only", spm_only),
              ("backbone", backbone), ("+pixel_decoder", pixdec),
              ("+decoder head", head), ("full", full)]
    results = {}
    for tag, stage in stages:
        def f(v, r, c, _stage=stage):
            return nn.apply(_stage, model)(v, img_of(r, c))
        try:
            ms = timed_loop(f, (variables, raw))
            results[tag] = ms
            print(f"  {tag:16s} {ms:8.1f} ms/batch4")
        except Exception as e:
            print(f"  {tag:16s} ERR {str(e)[:160]}")
    return results


def profile_micro():
    """Raw-op floors at flagship geometry (B4, Q200, C1024, 32 heads,
    mask_feature 128^2, memories 16/32/64^2 = 5376 tokens)."""
    from vitadapter.utils.resize import resize_hw

    k = jax.random.PRNGKey(0)
    B, Q, C, S = 4, 200, 1024, 5376
    emb = jax.random.normal(k, (B, Q, C), jnp.bfloat16)
    mf = jax.random.normal(k, (B, 128, 128, C), jnp.bfloat16)
    keys = jax.random.normal(k, (B, S, C), jnp.bfloat16)
    w_kv = jax.random.normal(k, (C, C), jnp.bfloat16)
    mask128 = jax.random.normal(k, (B, Q, 128, 128), jnp.float32)

    def mask_einsum(e, m, c):
        e = e + (c * 0).astype(e.dtype)
        return jnp.einsum("bqc,bhwc->bqhw", e, m,
                          preferred_element_type=jnp.float32).mean()

    def mask_resize(mm, c):
        mm = mm + c * 0
        # one decoder round resizes to each memory size
        return (resize_hw(mm, (16, 16)).mean()
                + resize_hw(mm, (32, 32)).mean()
                + resize_hw(mm, (64, 64)).mean())

    def kv_proj(kk, w, c):
        kk = kk + (c * 0).astype(kk.dtype)
        return (jnp.einsum("bsc,cd->bsd", kk, w).astype(jnp.float32).mean()
                + jnp.einsum("bsc,cd->bsd", kk, w * 2).astype(
                    jnp.float32).mean())

    prints = [
        ("mask einsum x10", lambda e, m, mm, kk, w, c:
            sum(mask_einsum(e, m * (i + 1), c) for i in range(10))),
        ("attn-mask resize x3 (one round)", lambda e, m, mm, kk, w, c:
            mask_resize(mm, c)),
        ("cross-attn k/v proj x9", lambda e, m, mm, kk, w, c:
            sum(kv_proj(kk, w * (i + 1), c) for i in range(9))),
    ]
    for tag, f in prints:
        try:
            ms = timed_loop(f, (emb, mf, mask128, keys, w_kv))
            print(f"  {tag:34s} {ms:8.1f} ms")
        except Exception as e:
            print(f"  {tag:34s} ERR {str(e)[:160]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--micro-only", action="store_true")
    a = ap.parse_args()
    print("--- micro ops (flagship geometry) ---")
    profile_micro()
    if not a.micro_only:
        print("--- cumulative stages (B4 512px bf16 eval) ---")
        profile_model_stages()
