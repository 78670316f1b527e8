"""Normalization layers.

Notes on SyncBatchNorm parity: the reference wraps SPM/adapter output norms in
`nn.SyncBatchNorm` (`adapter_modules.py:200-224`, `vit_adapter.py:47-50`).
Under `jit` over a sharded batch, a plain mean/variance over the batch axis IS
a global (all-replica) statistic — XLA inserts the collectives — so flax's
BatchNorm gives SyncBN semantics for free on a data mesh. `axis_name` is only
needed under shard_map/pmap.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    """BatchNorm over NHWC (stats over N,H,W) with running averages.

    momentum follows torch convention: running = (1-momentum)*running +
    momentum*batch_stat (torch momentum default 0.1), and batch variance used
    for normalization is biased, matching `nn.SyncBatchNorm`.
    """

    momentum: float = 0.1
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool = True) -> jax.Array:
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(C, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(C, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                var = jax.lax.pmean(var, self.axis_name)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                # torch running_var uses the unbiased batch variance.
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm for NHWC feature maps.

    Parity target: the channel-first LayerNorm at reference
    `detection/mmdet_custom/models/backbones/base/vit.py:210-230` (ours is
    channels-last; the math normalizes over the channel axis either way).
    """

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        xf = x.astype(jnp.float32)
        u = xf.mean(-1, keepdims=True)
        s = jnp.square(xf - u).mean(-1, keepdims=True)
        y = (xf - u) * jax.lax.rsqrt(s + self.eps)
        return (y * weight + bias).astype(x.dtype)
