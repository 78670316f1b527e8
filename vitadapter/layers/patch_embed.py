"""Patch embedding (NHWC).

Parity target: reference `detection/mmdet_custom/models/backbones/base/vit.py:39-62`.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class HybridEmbed(nn.Module):
    """CNN-stem patch embedding: run a conv backbone, flatten its last
    feature map, project to `embed_dim`.

    Parity target: reference `detection/mmdet_custom/models/backbones/base/
    beit.py:270` (HybridEmbed). The torch version probes the backbone with a
    dummy forward to learn the feature size; under jit the shapes are static,
    so the flax version just reads them off the traced feature map. The
    backbone must map (B, H, W, 3) -> (B, Hp, Wp, C) NHWC (or a list whose
    last entry is that map).
    """

    backbone: nn.Module
    embed_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, int, int]:
        feats = self.backbone(x)
        if isinstance(feats, (list, tuple)):
            feats = feats[-1]
        B, Hp, Wp, C = feats.shape
        tokens = feats.reshape(B, Hp * Wp, C)
        tokens = nn.Dense(self.embed_dim, dtype=self.dtype,
                          name="proj")(tokens)
        return tokens, Hp, Wp


class PatchEmbed(nn.Module):
    patch_size: int = 16
    embed_dim: int = 768
    use_bias: bool = True
    norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, int, int]:
        """x: (B, H, W, C) image -> (tokens (B, N, D), Hp, Wp)."""
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    use_bias=self.use_bias, dtype=self.dtype, name="proj")(x)
        B, Hp, Wp, D = x.shape
        x = x.reshape(B, Hp * Wp, D)
        if self.norm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x, Hp, Wp
