"""Plain ViT backbone (TIMM-style) in flax, NHWC / tokens-(B,N,C).

Parity target: `TIMMVisionTransformer`
(reference `detection/mmdet_custom/models/backbones/base/vit.py:354-446`)
including per-depth window-attention lists, layer scale, stochastic-depth
linspace, and the ViTDet-style `ResBottleneckBlock` used when
`residual_indices` is set (reference `base/vit.py:233-289`).
"""

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vitadapter.layers.attention import Attention, WindowedAttention
from vitadapter.layers.drop import DropPath
from vitadapter.layers.mlp import Mlp, gelu
from vitadapter.layers.norm import LayerNorm2d
from vitadapter.layers.patch_embed import PatchEmbed
from vitadapter.utils.resize import resize_2d


class ResBottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with channel LayerNorms, zero-init out norm.

    Reference `base/vit.py:233-289`. Operates on NHWC.
    """

    out_channels: int
    bottleneck_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = nn.Conv(self.bottleneck_channels, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = LayerNorm2d(name="norm1")(out)
        out = gelu(out)
        out = nn.Conv(self.bottleneck_channels, (3, 3), padding=1,
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = LayerNorm2d(name="norm2")(out)
        out = gelu(out)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        # zero-init final norm => block starts as identity
        C = out.shape[-1]
        w = self.param("norm3_weight", nn.initializers.zeros, (C,), jnp.float32)
        b = self.param("norm3_bias", nn.initializers.zeros, (C,), jnp.float32)
        xf = out.astype(jnp.float32)
        u = xf.mean(-1, keepdims=True)
        s = jnp.square(xf - u).mean(-1, keepdims=True)
        out = (((xf - u) * jax.lax.rsqrt(s + 1e-6)) * w + b).astype(x.dtype)
        return x + out


class Block(nn.Module):
    """Pre-norm transformer block with optional windowing / layer scale.

    Reference `base/vit.py:292-351`.
    """

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    drop_path: float = 0.0
    windowed: bool = False
    window_size: int = 14
    use_residual: bool = False
    layer_scale: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, H: int, W: int,
                 deterministic: bool = True) -> jax.Array:
        dim = x.shape[-1]
        if self.windowed:
            attn = WindowedAttention(num_heads=self.num_heads,
                                     qkv_bias=self.qkv_bias,
                                     window_size=self.window_size,
                                     dtype=self.dtype, name="attn")
        else:
            attn = Attention(num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                             dtype=self.dtype, name="attn")
        norm1 = nn.LayerNorm(epsilon=1e-6, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-6, name="norm2")
        mlp = Mlp(hidden_features=int(dim * self.mlp_ratio), drop=self.drop,
                  dtype=self.dtype, name="mlp")
        dp = DropPath(self.drop_path)

        a = attn(norm1(x), H, W, deterministic=deterministic)
        if self.layer_scale:
            gamma1 = self.param("gamma1", nn.initializers.ones, (dim,), jnp.float32)
            a = gamma1 * a
        x = x + dp(a, deterministic=deterministic)
        m = mlp(norm2(x), deterministic=deterministic)
        if self.layer_scale:
            gamma2 = self.param("gamma2", nn.initializers.ones, (dim,), jnp.float32)
            m = gamma2 * m
        x = x + dp(m, deterministic=deterministic)

        if self.use_residual:
            B, N, C = x.shape
            xm = x.reshape(B, H, W, C)
            xm = ResBottleneckBlock(out_channels=C, bottleneck_channels=C // 2,
                                    dtype=self.dtype, name="residual")(xm)
            x = xm.reshape(B, N, C)
        return x


def resample_abs_pos_embed(pos_embed: jax.Array, grid_hw: Tuple[int, int],
                           target_hw: Tuple[int, int]) -> jax.Array:
    """Bicubic-resample a (1, gh*gw, D) pos embed to (1, H*W, D).

    Reference `ViTAdapter._get_pos_embed` (`vit_adapter.py:73-78`) uses
    F.interpolate(mode='bicubic', align_corners=False); `resize_2d` reproduces
    torch's a=-0.75 cubic kernel exactly.
    """
    gh, gw = grid_hw
    H, W = target_hw
    if (gh, gw) == (H, W):
        return pos_embed
    D = pos_embed.shape[-1]
    pe = pos_embed.reshape(gh, gw, D)
    pe = resize_2d(pe, (H, W), method="bicubic")
    return pe.reshape(1, H * W, D)


class TIMMVisionTransformer(nn.Module):
    """Plain ViT trunk. Exposes `embed()` (patch+pos) and `run_blocks()` so the
    adapter can interleave Injector/Extractor between block spans."""

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    layer_scale: bool = True
    window_attn: Sequence[bool] | bool = False
    window_size: Sequence[int] | int = 14
    residual_indices: Sequence[int] = ()
    pretrain_size: int = 224
    with_cp: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        depth = self.depth
        window_attn = (self.window_attn if isinstance(self.window_attn, (list, tuple))
                       else [self.window_attn] * depth)
        window_size = (self.window_size if isinstance(self.window_size, (list, tuple))
                       else [self.window_size] * depth)
        dpr = np.linspace(0, self.drop_path_rate, depth)
        self.patch_embed = PatchEmbed(patch_size=self.patch_size,
                                      embed_dim=self.embed_dim, dtype=self.dtype)
        grid = self.pretrain_size // self.patch_size
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, grid * grid + 1, self.embed_dim), jnp.float32)
        block_cls = Block
        if self.with_cp:
            block_cls = nn.remat(Block, static_argnums=(2, 3, 4))
        self.blocks = [
            block_cls(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                      qkv_bias=self.qkv_bias, drop=self.drop_rate,
                      drop_path=float(dpr[i]), windowed=bool(window_attn[i]),
                      window_size=int(window_size[i] or 14),
                      layer_scale=self.layer_scale,
                      use_residual=i in self.residual_indices,
                      dtype=self.dtype, name=f"blocks_{i}")
            for i in range(depth)
        ]
        self.pos_drop = nn.Dropout(self.drop_rate)

    def embed(self, x: jax.Array, deterministic: bool = True):
        """Patchify + add (resampled) pos embed, dropping the cls slot."""
        tokens, H, W = self.patch_embed(x)
        grid = self.pretrain_size // self.patch_size
        pe = resample_abs_pos_embed(self.pos_embed[:, 1:].astype(jnp.float32),
                                    (grid, grid), (H, W)).astype(tokens.dtype)
        tokens = self.pos_drop(tokens + pe, deterministic=deterministic)
        return tokens, H, W

    def run_blocks(self, x: jax.Array, H: int, W: int, start: int, end: int,
                   deterministic: bool = True) -> jax.Array:
        for blk in self.blocks[start:end]:
            x = blk(x, H, W, deterministic)
        return x

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        tokens, H, W = self.embed(x, deterministic)
        return self.run_blocks(tokens, H, W, 0, self.depth, deterministic)
