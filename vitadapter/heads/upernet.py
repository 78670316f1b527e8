"""UperNet decode head + FCN auxiliary head (semantic segmentation).

Parity targets: upstream mmseg `UPerHead` / `FCNHead` as configured by the
reference (`segmentation/configs/_base_/models/upernet_r50.py`,
`upernet_deit_adapter_tiny_512_160k_ade20k.py` — pool_scales (1,2,3,6),
channels 512, align_corners=False). Pure conv/resize — maps directly onto
MXU + fused elementwise on TPU. NHWC throughout.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitadapter.layers.norm import BatchNorm
from vitadapter.utils.resize import resize_2d


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding=pad,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = BatchNorm(name="bn")(x, use_running_average=not train)
        return nn.relu(x)


def adaptive_avg_pool(x: jax.Array, out_hw: int) -> jax.Array:
    """torch AdaptiveAvgPool2d parity for NHWC maps (static shapes)."""
    B, H, W, C = x.shape
    o = out_hw
    # torch splits into o segments with boundaries floor(i*H/o)..ceil((i+1)*H/o)
    ys = [(i * H) // o for i in range(o)] + [H]
    xs = [(i * W) // o for i in range(o)] + [W]
    ye = [-(-(i + 1) * H // o) for i in range(o)]
    xe = [-(-(i + 1) * W // o) for i in range(o)]
    rows = []
    for i in range(o):
        cols = []
        for j in range(o):
            cols.append(x[:, ys[i]:ye[i], xs[j]:xe[j]].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, o, o, C)


class PSPModule(nn.Module):
    """Pyramid pooling over the coarsest feature map."""

    pool_scales: Sequence[int] = (1, 2, 3, 6)
    channels: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        H, W = x.shape[1], x.shape[2]
        outs = [x]
        for i, s in enumerate(self.pool_scales):
            p = adaptive_avg_pool(x, s)
            p = ConvBNReLU(self.channels, kernel=1, dtype=self.dtype,
                           name=f"pool_{i}")(p, train)
            outs.append(resize_2d(p, (H, W), "bilinear"))
        return jnp.concatenate(outs, axis=-1)


class UPerHead(nn.Module):
    """PSP + FPN fusion head -> per-pixel class logits at stride 4."""

    num_classes: int = 150
    channels: int = 512
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dropout_ratio: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False) -> jax.Array:
        # PSP on the coarsest level -> bottleneck
        psp = PSPModule(self.pool_scales, self.channels, dtype=self.dtype,
                        name="psp")(feats[-1], train)
        laterals = [
            ConvBNReLU(self.channels, kernel=1, dtype=self.dtype,
                       name=f"lateral_{i}")(feats[i], train)
            for i in range(len(feats) - 1)
        ]
        laterals.append(ConvBNReLU(self.channels, kernel=3, dtype=self.dtype,
                                   name="psp_bottleneck")(psp, train))
        # top-down pathway
        for i in range(len(laterals) - 1, 0, -1):
            up = resize_2d(laterals[i], laterals[i - 1].shape[1:3], "bilinear")
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            ConvBNReLU(self.channels, kernel=3, dtype=self.dtype,
                       name=f"fpn_conv_{i}")(laterals[i], train)
            for i in range(len(laterals) - 1)
        ]
        outs.append(laterals[-1])
        target_hw = outs[0].shape[1:3]
        outs = [outs[0]] + [resize_2d(o, target_hw, "bilinear") for o in outs[1:]]
        x = jnp.concatenate(outs, axis=-1)
        x = ConvBNReLU(self.channels, kernel=3, dtype=self.dtype,
                       name="fpn_bottleneck")(x, train)
        x = nn.Dropout(self.dropout_ratio)(x, deterministic=not train)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="conv_seg")(x)


class FCNHead(nn.Module):
    """Single-conv auxiliary head on one backbone level."""

    num_classes: int = 150
    channels: int = 256
    num_convs: int = 1
    dropout_ratio: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(self.num_convs):
            x = ConvBNReLU(self.channels, kernel=3, dtype=self.dtype,
                           name=f"conv_{i}")(x, train)
        x = nn.Dropout(self.dropout_ratio)(x, deterministic=not train)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="conv_seg")(x)
