"""Patch embedding (NHWC).

Parity target: reference `detection/mmdet_custom/models/backbones/base/vit.py:39-62`.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


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
