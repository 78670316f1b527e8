"""ViTAdapter backbone: plain ViT + spatial-prior adapter -> 4-scale pyramid.

Parity target: `ViTAdapter`
(reference `detection/mmdet_custom/models/backbones/vit_adapter.py:20-132`).
Contract: forward(image NHWC) -> [f1, f2, f3, f4] NHWC feature maps at strides
4/8/16/32, all with `embed_dim` channels.
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitadapter.layers.norm import BatchNorm
from vitadapter.models.adapter import (
    InteractionBlock,
    SpatialPriorModule,
    deform_inputs,
)
from vitadapter.models.vit import TIMMVisionTransformer
from vitadapter.utils.resize import resize_2d


class ViTAdapter(nn.Module):
    # ViT trunk knobs
    img_size: int = 224  # advisory (pos embed resamples at runtime)
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    layer_scale: bool = True
    window_attn: Sequence[bool] | bool = False
    window_size: Sequence[int] | int = 14
    residual_indices: Sequence[int] = ()
    pretrain_size: int = 224
    with_cp: bool = False
    # Adapter knobs
    conv_inplane: int = 64
    n_points: int = 4
    deform_num_heads: int = 6
    init_values: float = 0.0
    interaction_indexes: Sequence[Sequence[int]] = ((0, 2), (3, 5), (6, 8), (9, 11))
    with_cffn: bool = True
    cffn_ratio: float = 0.25
    deform_ratio: float = 1.0
    add_vit_feature: bool = True
    use_extra_extractor: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vit = TIMMVisionTransformer(
            patch_size=self.patch_size, embed_dim=self.embed_dim,
            depth=self.depth, num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
            drop_path_rate=self.drop_path_rate, layer_scale=self.layer_scale,
            window_attn=self.window_attn, window_size=self.window_size,
            residual_indices=self.residual_indices,
            pretrain_size=self.pretrain_size, with_cp=self.with_cp,
            dtype=self.dtype)
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (3, self.embed_dim),
            jnp.float32)
        self.spm = SpatialPriorModule(inplanes=self.conv_inplane,
                                      embed_dim=self.embed_dim, dtype=self.dtype)
        n_inter = len(self.interaction_indexes)
        self.interactions = [
            InteractionBlock(
                num_heads=self.deform_num_heads, n_points=self.n_points,
                init_values=self.init_values, drop_path=self.drop_path_rate,
                with_cffn=self.with_cffn, cffn_ratio=self.cffn_ratio,
                deform_ratio=self.deform_ratio,
                extra_extractor=(i == n_inter - 1) and self.use_extra_extractor,
                dtype=self.dtype, name=f"interactions_{i}")
            for i in range(n_inter)
        ]
        self.up = nn.ConvTranspose(self.embed_dim, (2, 2), strides=(2, 2),
                                   dtype=self.dtype)
        self.norm1 = BatchNorm()
        self.norm2 = BatchNorm()
        self.norm3 = BatchNorm()
        self.norm4 = BatchNorm()

    def __call__(self, x: jax.Array, train: bool = False):
        """x: (B, H, W, 3) image, H and W divisible by 32."""
        B, H_img, W_img, _ = x.shape
        det = not train
        injector_inputs, extractor_inputs = deform_inputs(H_img, W_img)

        # Spatial prior
        c1, c2, c3, c4 = self.spm(x, train=train)
        c2 = c2 + self.level_embed[0]
        c3 = c3 + self.level_embed[1]
        c4 = c4 + self.level_embed[2]
        c = jnp.concatenate([c2, c3, c4], axis=1)
        n2, n3 = c2.shape[1], c3.shape[1]

        # ViT patch embedding (+ resampled pos embed, no cls token)
        t, H, W = self.vit.embed(x, deterministic=det)
        dim = t.shape[-1]

        # Interleaved interaction
        for i, layer in enumerate(self.interactions):
            a, b = self.interaction_indexes[i]

            def blocks_fn(tokens, _a=a, _b=b):
                return self.vit.run_blocks(tokens, H, W, _a, _b + 1,
                                           deterministic=det)

            t, c = layer(t, c, blocks_fn, injector_inputs, extractor_inputs,
                         H, W, deterministic=det)

        # Split token pyramid back to NHWC maps
        c2 = c[:, :n2].reshape(B, H * 2, W * 2, dim)
        c3 = c[:, n2:n2 + n3].reshape(B, H, W, dim)
        c4 = c[:, n2 + n3:].reshape(B, H // 2, W // 2, dim)
        c1 = self.up(c2) + c1

        if self.add_vit_feature:
            x3 = t.reshape(B, H, W, dim)
            x1 = resize_2d(x3, (H * 4, W * 4), "bilinear")
            x2 = resize_2d(x3, (H * 2, W * 2), "bilinear")
            x4 = resize_2d(x3, (H // 2, W // 2), "bilinear")
            c1, c2, c3, c4 = c1 + x1, c2 + x2, c3 + x3, c4 + x4

        use_ra = det
        f1 = self.norm1(c1, use_running_average=use_ra)
        f2 = self.norm2(c2, use_running_average=use_ra)
        f3 = self.norm3(c3, use_running_average=use_ra)
        f4 = self.norm4(c4, use_running_average=use_ra)
        return [f1, f2, f3, f4]
