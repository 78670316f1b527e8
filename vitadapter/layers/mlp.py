"""Transformer MLP block (timm `Mlp` equivalent)."""

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.GELU defaults to the exact erf formulation; flax defaults to tanh
# approximation — pin exact for checkpoint parity.
gelu = partial(nn.gelu, approximate=False)


class Mlp(nn.Module):
    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    act: Callable = gelu
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        in_features = x.shape[-1]
        hidden = self.hidden_features or in_features
        out = self.out_features or in_features
        x = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x
