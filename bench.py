"""Benchmark: images/sec/chip for the flagship segmentor (BASELINE.json metric).

Runs eval-mode forward (the serving path) of ViT-Adapter-L at ADE20K 512px on
the available chip, bf16 activations, jit-compiled, preprocessing fused.
Prints ONE JSON line. The reference publishes no throughput numbers
(SURVEY §6) — the baseline constant below is this framework's first measured
round-1 value, so vs_baseline tracks our own progress.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# First measured value (round 1, TPU v5e single chip). Update only the metric
# history, not this anchor.
BASELINE_IMG_PER_SEC = None  # set after first TPU measurement


def build_flagship(dtype=jnp.bfloat16):
    try:
        from vitadapter.zoo import mask2former_vit_adapter  # noqa: F401
        model = mask2former_vit_adapter("large", dtype=dtype)
        name = "ViT-Adapter-L Mask2Former"
    except ImportError:
        from vitadapter.zoo import upernet_vit_adapter
        model = upernet_vit_adapter("large", dtype=dtype)
        name = "ViT-Adapter-L UperNet"
    return model, name


def main():
    from vitadapter.data.preprocess import normalize

    batch, H, W = 4, 512, 512
    model, name = build_flagship()
    raw = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (batch, H, W, 3), np.uint8))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), normalize(raw, dtype=jnp.bfloat16))

    @jax.jit
    def forward(variables, raw):
        img = normalize(raw, dtype=jnp.bfloat16)
        return model.apply(variables, img)

    out = forward(variables, raw)
    jax.block_until_ready(out)
    # timed
    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = forward(variables, raw)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    img_s = batch * n_iter / dt

    vs = 1.0 if BASELINE_IMG_PER_SEC is None else img_s / BASELINE_IMG_PER_SEC
    print(json.dumps({
        "metric": f"images/sec/chip ({name}, ADE20K 512px eval forward)",
        "value": round(img_s, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
