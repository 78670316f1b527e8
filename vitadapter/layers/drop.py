"""Stochastic depth (DropPath).

Parity target: timm `DropPath` as used by reference blocks
(`detection/mmdet_custom/models/backbones/base/vit.py:308`).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn


class DropPath(nn.Module):
    """Per-sample stochastic depth: drop the residual branch entirely."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
