"""Adapter-free baseline backbones.

Parity targets:
  * `ViTBaseline` (reference `detection/mmdet_custom/models/backbones/
    vit_baseline.py:16`): plain ViT trunk + simple feature pyramid
    (ViTDet-style up/down samplers from the single 16-stride map).
  * `BEiTBaseline` (reference `segmentation/mmseg_custom/models/backbones/
    beit_baseline.py`): same recipe over the BEiT trunk.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitadapter.layers.norm import LayerNorm2d
from vitadapter.models.beit import BEiT
from vitadapter.models.vit import TIMMVisionTransformer


class SimpleFeaturePyramid(nn.Module):
    """16s token map -> strides 4/8/16/32 (deconv x4 / deconv x2 / id / pool)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) 16-stride map, or a list of 4 such maps (one per
        output scale, e.g. from BEiT `out_indices` blocks)."""
        xs = x if isinstance(x, (list, tuple)) else [x] * 4
        C = xs[0].shape[-1]
        f4 = nn.ConvTranspose(C, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="up4_a")(xs[0])
        f4 = nn.gelu(LayerNorm2d(name="up4_norm")(f4), approximate=False)
        f4 = nn.ConvTranspose(C, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="up4_b")(f4)
        f8 = nn.ConvTranspose(C, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="up8")(xs[1])
        f16 = xs[2]
        f32 = nn.max_pool(xs[3], (2, 2), strides=(2, 2))
        outs = []
        for i, f in enumerate((f4, f8, f16, f32)):
            y = nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"out_conv1_{i}")(f)
            y = LayerNorm2d(name=f"out_norm1_{i}")(y)
            y = nn.Conv(C, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"out_conv2_{i}")(y)
            outs.append(LayerNorm2d(name=f"out_norm2_{i}")(y))
        return outs


class ViTBaseline(nn.Module):
    """Plain ViT + simple pyramid — same 4-scale contract as ViTAdapter."""

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    drop_path_rate: float = 0.0
    layer_scale: bool = True
    window_attn: Sequence[bool] | bool = False
    window_size: Sequence[int] | int = 14
    pretrain_size: int = 224
    with_cp: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vit = TIMMVisionTransformer(
            patch_size=self.patch_size, embed_dim=self.embed_dim,
            depth=self.depth, num_heads=self.num_heads,
            drop_path_rate=self.drop_path_rate, layer_scale=self.layer_scale,
            window_attn=self.window_attn, window_size=self.window_size,
            pretrain_size=self.pretrain_size, with_cp=self.with_cp,
            dtype=self.dtype)
        self.pyramid = SimpleFeaturePyramid(dtype=self.dtype)

    def __call__(self, x: jax.Array, train: bool = False):
        B = x.shape[0]
        t, H, W = self.vit.embed(x, deterministic=not train)
        t = self.vit.run_blocks(t, H, W, 0, self.depth,
                                deterministic=not train)
        return self.pyramid(t.reshape(B, H, W, -1))


class BEiTBaseline(nn.Module):
    """BEiT trunk + simple pyramid (reference `beit_baseline.py`)."""

    img_size: int = 512
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    init_values: float = 1e-6
    drop_path_rate: float = 0.0
    use_rel_pos_bias: bool = True
    # per-scale source blocks (reference mmseg BEiT `out_indices=[7,11,15,23]`
    # in `upernet_beit_large_512_...py`); None = all scales from the last block
    out_indices: Sequence[int] | None = None
    with_cp: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.beit = BEiT(img_size=self.img_size, patch_size=self.patch_size,
                         embed_dim=self.embed_dim, depth=self.depth,
                         num_heads=self.num_heads,
                         init_values=self.init_values,
                         drop_path_rate=self.drop_path_rate,
                         use_rel_pos_bias=self.use_rel_pos_bias,
                         with_cp=self.with_cp, dtype=self.dtype)
        self.pyramid = SimpleFeaturePyramid(dtype=self.dtype)

    def __call__(self, x: jax.Array, train: bool = False):
        B = x.shape[0]
        t, H, W = self.beit.embed(x, deterministic=not train)
        cls = jnp.broadcast_to(self.beit.cls_token.astype(t.dtype),
                               (B, 1, self.embed_dim))
        t = jnp.concatenate([cls, t], axis=1)
        if self.out_indices is None:
            t = self.beit.run_blocks(t, H, W, 0, self.depth,
                                     deterministic=not train)
            return self.pyramid(t[:, 1:].reshape(B, H, W, -1))
        taps = []
        start = 0
        for idx in self.out_indices:
            t = self.beit.run_blocks(t, H, W, start, idx + 1,
                                     deterministic=not train)
            start = idx + 1
            taps.append(t[:, 1:].reshape(B, H, W, -1))
        return self.pyramid(taps)
