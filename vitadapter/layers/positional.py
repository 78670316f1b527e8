"""Positional encodings.

Parity target: mmcv `SinePositionalEncoding` / `LearnedPositionalEncoding` as
vendored at reference
`segmentation/mmseg_custom/models/utils/positional_encoding.py:11,106`
(num_feats=128 for 256-d heads, 512 for the 1024-d flagship; normalize=True).
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def sine_positional_encoding(hw: Tuple[int, int], num_feats: int,
                             temperature: float = 10000.0,
                             normalize: bool = True,
                             scale: float = 2 * math.pi,
                             eps: float = 1e-6) -> jnp.ndarray:
    """(H, W, 2*num_feats) sine/cosine embedding, channels [pos_y, pos_x].

    Matches mmcv with an all-valid (no padding) mask: cumsum of ones is the
    1-based index along each axis.
    """
    H, W = hw
    y = jnp.arange(1, H + 1, dtype=jnp.float32)[:, None] * jnp.ones((1, W))
    x = jnp.arange(1, W + 1, dtype=jnp.float32)[None, :] * jnp.ones((H, 1))
    if normalize:
        y = y / (H + eps) * scale
        x = x / (W + eps) * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_y = y[..., None] / dim_t
    pos_x = x[..., None] / dim_t
    # interleave sin on even dims, cos on odd dims
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(H, W, num_feats)
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(H, W, num_feats)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class LearnedPositionalEncoding(nn.Module):
    """Learned row/col embeddings (reference `positional_encoding.py:106`)."""

    num_feats: int = 128
    row_num_embed: int = 50
    col_num_embed: int = 50

    @nn.compact
    def __call__(self, hw: Tuple[int, int]) -> jax.Array:
        H, W = hw
        row = self.param("row_embed", nn.initializers.uniform(1.0),
                         (self.row_num_embed, self.num_feats))
        col = self.param("col_embed", nn.initializers.uniform(1.0),
                         (self.col_num_embed, self.num_feats))
        x = jnp.tile(col[None, :W], (H, 1, 1))
        y = jnp.tile(row[:H, None], (1, W, 1))
        return jnp.concatenate([x, y], axis=-1)
