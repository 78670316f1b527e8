"""Patch merging + adaptive padding (S7 leftovers from the vendored DETR
transformer library, reference
`segmentation/mmseg_custom/models/utils/transformer.py:37,108`).

`AdaptivePadding` pads NHWC maps so a (kernel, stride) sliding window covers
them exactly ('same'/'corner' modes); `PatchMerging` concatenates each 2x2
neighborhood and projects — the Swin-style downsampling layer.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def adaptive_padding(x: jax.Array, kernel: int, stride: int,
                     mode: str = "corner") -> jax.Array:
    """Pad (B, H, W, C) so (H, W) fit the sliding window exactly."""
    B, H, W, C = x.shape
    out_h = -(-H // stride)
    out_w = -(-W // stride)
    pad_h = max((out_h - 1) * stride + kernel - H, 0)
    pad_w = max((out_w - 1) * stride + kernel - W, 0)
    if pad_h == 0 and pad_w == 0:
        return x
    if mode == "corner":
        return jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    # 'same': split padding evenly
    return jnp.pad(x, ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                       (pad_w // 2, pad_w - pad_w // 2), (0, 0)))


class PatchMerging(nn.Module):
    """2x2 neighborhood concat + LayerNorm + linear projection."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """(B, H, W, C) -> (B, ceil(H/2), ceil(W/2), out_channels)."""
        x = adaptive_padding(x, kernel=2, stride=2)
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)
