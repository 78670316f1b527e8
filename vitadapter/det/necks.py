"""Detection necks: FPN, ExtraAttention, ChannelMapperWithPooling.

Parity targets:
  * mmdet `FPN` (num_outs=5 with extra max-pool level, as used by the
    reference Mask R-CNN configs)
  * `ExtraAttention` (reference
    `detection/mmdet_custom/models/necks/extra_attention.py:60-130`): one
    global MHSA (+optional FFN) on the coarsest level(s) before the FPN —
    used by HTC++.
  * `ChannelMapperWithPooling` (reference
    `detection/mmdet_custom/models/necks/channel_mapper.py:9`).
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitadapter.layers.attention import Attention
from vitadapter.layers.norm import LayerNorm2d
from vitadapter.utils.resize import resize_2d


class FPN(nn.Module):
    """Top-down FPN: 1x1 laterals + 3x3 output convs.

    Extra levels follow mmdet: `extra='pool'` = kernel-1 stride-2 max-pool
    of the last output (add_extra_convs=False — the Mask R-CNN / HTC++
    configs); `extra='on_output'` = LEARNED 3x3 stride-2 convs chained on
    the last output (the ATSS/GFL configs, which also set start_level=1 so
    the pyramid runs strides 8..128)."""

    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    extra: str = "pool"  # 'pool' | 'on_output'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        feats = list(feats)[self.start_level:]
        L = len(feats)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(feats[i])
            for i in range(L)
        ]
        for i in range(L - 1, 0, -1):
            # mmdet FPN default upsample_cfg = dict(mode='nearest'); the
            # reference det configs do not override it
            laterals[i - 1] = laterals[i - 1] + resize_2d(
                laterals[i], laterals[i - 1].shape[1:3], "nearest")
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"fpn_conv_{i}")(laterals[i])
            for i in range(L)
        ]
        j = L
        while len(outs) < self.num_outs:
            if self.extra == "on_output":
                outs.append(
                    nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                            padding=1, dtype=self.dtype,
                            name=f"fpn_conv_{j}")(outs[-1]))
                j += 1
            else:
                outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs


class ExtraAttention(nn.Module):
    """Global MHSA (+FFN, final LN) on the coarsest level before the FPN
    (reference `extra_attention.py:60-152`: torch-default LN eps, optional
    layer-scale gammas via init_values, use_final_norm=True default)."""

    num_heads: int = 8
    with_ffn: bool = True
    ffn_ratio: float = 4.0
    use_final_norm: bool = True
    init_values: float = 0.0   # >0 enables layer-scale gammas
    apply_to_last: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        feats = list(feats)
        for k in range(self.apply_to_last):
            i = len(feats) - 1 - k
            f = feats[i]
            B, H, W, C = f.shape
            x = f.reshape(B, H * W, C)
            a = Attention(num_heads=self.num_heads, qkv_bias=True,
                          dtype=self.dtype, name=f"attn_{k}")(
                nn.LayerNorm(epsilon=1e-5, name=f"norm1_{k}")(x), H, W)
            if self.init_values > 0:
                g1 = self.param(f"gamma_1_{k}",
                                nn.initializers.constant(self.init_values),
                                (C,), jnp.float32)
                a = g1 * a
            x = x + a
            if self.with_ffn:
                y = nn.Dense(int(C * self.ffn_ratio), dtype=self.dtype,
                             name=f"ffn_fc1_{k}")(
                    nn.LayerNorm(epsilon=1e-5, name=f"norm2_{k}")(x))
                y = nn.gelu(y, approximate=False)
                y = nn.Dense(C, dtype=self.dtype, name=f"ffn_fc2_{k}")(y)
                if self.init_values > 0:
                    g2 = self.param(
                        f"gamma_2_{k}",
                        nn.initializers.constant(self.init_values),
                        (C,), jnp.float32)
                    y = g2 * y
                x = x + y
            if self.use_final_norm:
                x = nn.LayerNorm(epsilon=1e-5, name=f"final_norm_{k}")(x)
            feats[i] = x.reshape(B, H, W, C)
        return feats


class ChannelMapperWithPooling(nn.Module):
    """1x1(+GN) channel mapping per level, extra levels via 2x2 stride-2
    max-pooling of the last map (reference
    `detection/mmdet_custom/models/necks/channel_mapper.py:73`)."""

    out_channels: int = 256
    num_outs: int = 4
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        outs = []
        for i, f in enumerate(feats):
            y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"conv_{i}")(f)
            y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                             dtype=self.dtype, name=f"gn_{i}")(y)
            outs.append(y)
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (2, 2), strides=(2, 2)))
        return outs


class ChannelMapper(nn.Module):
    """Upstream mmdet ChannelMapper as the wsdm DINO configs use it
    (kernel 1, GN(32), act None, num_outs 4): 1x1(+GN) per input level,
    extra levels via LEARNED 3x3 stride-2 conv(+GN) — first extra reads the
    last INPUT feature, later extras chain."""

    out_channels: int = 256
    num_outs: int = 4
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        outs = []
        for i, f in enumerate(feats):
            y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"conv_{i}")(f)
            y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                             dtype=self.dtype, name=f"gn_{i}")(y)
            outs.append(y)
        src = feats[-1]
        j = 0
        while len(outs) < self.num_outs:
            y = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=1, use_bias=False, dtype=self.dtype,
                        name=f"extra_conv_{j}")(src)
            y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                             dtype=self.dtype, name=f"extra_gn_{j}")(y)
            outs.append(y)
            src = y
            j += 1
        return outs
