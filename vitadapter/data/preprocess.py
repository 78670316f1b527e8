"""On-device image preprocessing, fused into the jit graph.

The host ships raw uint8 NHWC batches; normalize / pad / resize compile into
the forward program (BASELINE.json north star: preprocessing fused into jit).
Normalization constants match the reference `img_norm_cfg`
(`upernet_deit_adapter_tiny_512_160k_ade20k.py`): ImageNet mean/std, RGB.
"""

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


def normalize(img: jax.Array, mean=IMAGENET_MEAN, std=IMAGENET_STD,
              dtype=jnp.float32) -> jax.Array:
    """uint8/float RGB NHWC -> normalized float."""
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    return ((img.astype(jnp.float32) - m) / s).astype(dtype)


def pad_to_multiple(img: jax.Array, divisor: int = 32, value: float = 0.0):
    """Pad H, W (static) up to a multiple of divisor. Returns (img, (H, W))."""
    B, H, W, C = img.shape
    Hp = -(-H // divisor) * divisor
    Wp = -(-W // divisor) * divisor
    if (Hp, Wp) != (H, W):
        img = jnp.pad(img, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)),
                      constant_values=value)
    return img, (H, W)


def pad_to_bucket(img: jax.Array, step: int = 128, divisor: int = 32,
                  value: float = 0.0):
    """Pad H, W up to the next multiple of `step` (itself rounded up to a
    multiple of `divisor`). Returns (img, (H, W)).

    Variable-size whole-mode eval would otherwise trigger one XLA compile
    per distinct image shape (~minutes each for L models); quantizing the
    padded shape to a small static bucket set bounds the number of compiles
    (SURVEY §7 "pad-to-bucket"). With step=128, a 512-short-side eval set
    compiles a handful of (512, k*128) programs that are reused.
    """
    step = -(-step // divisor) * divisor
    B, H, W, C = img.shape
    Hp = -(-H // step) * step
    Wp = -(-W // step) * step
    if (Hp, Wp) != (H, W):
        img = jnp.pad(img, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)),
                      constant_values=value)
    return img, (H, W)
