"""BEiTAdapter backbone.

Parity target: `BEiTAdapter`
(reference `segmentation/mmseg_custom/models/backbones/beit_adapter.py:20-137`):
same adapter skeleton as ViTAdapter, but
  * the BEiT cls token rides along the trunk blocks (re-attached before each
    block span, split off for the deformable interactions)
  * `add_vit_feature` uses the PER-INTERACTION trunk outputs x1..x4 (reference
    seg `:111-131`); the det variant instead broadcasts the final map by
    default (`version` attribute below)
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitadapter.layers.norm import BatchNorm
from vitadapter.models.adapter import (
    InteractionBlock,
    SpatialPriorModule,
    deform_inputs,
)
from vitadapter.models.beit import BEiT
from vitadapter.utils.resize import resize_2d


class BEiTAdapter(nn.Module):
    # trunk knobs
    img_size: int = 512
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_values: float = 1e-6
    drop_path_rate: float = 0.0
    use_abs_pos_emb: bool = False
    use_rel_pos_bias: bool = True
    window_attn: Sequence[bool] | bool = False
    window_size: Sequence[int] | int = 14
    with_cp: bool = False
    use_cls_token: bool = True  # det windowed variant sets False
    # adapter knobs
    conv_inplane: int = 64
    n_points: int = 4
    deform_num_heads: int = 16
    interaction_indexes: Sequence[Sequence[int]] = ((0, 5), (6, 11), (12, 17),
                                                    (18, 23))
    with_cffn: bool = True
    cffn_ratio: float = 0.25
    deform_ratio: float = 0.5
    add_vit_feature: bool = True
    # which trunk maps feed add_vit_feature: "seg" (default) = the seg
    # variant's per-interaction outputs x1..x4 (reference seg
    # `beit_adapter.py:111-131`); "new" = broadcast the FINAL map to all four
    # scales (det variant default, det `beit_adapter.py:23,129`); "old" = det
    # alias for per-interaction (det `..._old.py` released checkpoints)
    version: str = "seg"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.beit = BEiT(
            img_size=self.img_size, patch_size=self.patch_size,
            embed_dim=self.embed_dim, depth=self.depth,
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, init_values=self.init_values,
            drop_path_rate=self.drop_path_rate,
            use_abs_pos_emb=self.use_abs_pos_emb,
            use_rel_pos_bias=self.use_rel_pos_bias,
            window_attn=self.window_attn, window_size=self.window_size,
            with_cp=self.with_cp, use_cls_token=self.use_cls_token,
            dtype=self.dtype)
        self.level_embed = self.param("level_embed",
                                      nn.initializers.normal(1.0),
                                      (3, self.embed_dim), jnp.float32)
        self.spm = SpatialPriorModule(inplanes=self.conv_inplane,
                                      embed_dim=self.embed_dim,
                                      dtype=self.dtype)
        n_inter = len(self.interaction_indexes)
        self.interactions = [
            InteractionBlock(
                num_heads=self.deform_num_heads, n_points=self.n_points,
                init_values=self.init_values,
                drop_path=self.drop_path_rate, with_cffn=self.with_cffn,
                cffn_ratio=self.cffn_ratio, deform_ratio=self.deform_ratio,
                extra_extractor=i == n_inter - 1, dtype=self.dtype,
                name=f"interactions_{i}")
            for i in range(n_inter)
        ]
        self.up = nn.ConvTranspose(self.embed_dim, (2, 2), strides=(2, 2),
                                   dtype=self.dtype)
        self.norm1 = BatchNorm()
        self.norm2 = BatchNorm()
        self.norm3 = BatchNorm()
        self.norm4 = BatchNorm()

    def __call__(self, x: jax.Array, train: bool = False):
        B, H_img, W_img, _ = x.shape
        det = not train
        injector_inputs, extractor_inputs = deform_inputs(H_img, W_img)

        c1, c2, c3, c4 = self.spm(x, train=train)
        c2 = c2 + self.level_embed[0]
        c3 = c3 + self.level_embed[1]
        c4 = c4 + self.level_embed[2]
        c = jnp.concatenate([c2, c3, c4], axis=1)
        n2, n3 = c2.shape[1], c3.shape[1]

        t, H, W = self.beit.embed(x, deterministic=det)
        dim = t.shape[-1]
        cls = (jnp.broadcast_to(self.beit.cls_token.astype(t.dtype),
                                (B, 1, dim)) if self.use_cls_token else None)

        outs = []
        for i, layer in enumerate(self.interactions):
            a, b = self.interaction_indexes[i]

            def blocks_fn(tokens, _a=a, _b=b):
                # cls (seg variant) rides along the trunk blocks only
                if blocks_fn.cls is not None:
                    tokens = jnp.concatenate([blocks_fn.cls, tokens], axis=1)
                tokens = self.beit.run_blocks(tokens, H, W, _a, _b + 1,
                                              deterministic=det)
                if blocks_fn.cls is not None:
                    blocks_fn.cls = tokens[:, :1]
                    return tokens[:, 1:]
                return tokens

            blocks_fn.cls = cls
            t, c = layer(t, c, blocks_fn, injector_inputs, extractor_inputs,
                         H, W, deterministic=det)
            cls = blocks_fn.cls
            outs.append(t.reshape(B, H, W, dim))

        c2 = c[:, :n2].reshape(B, H * 2, W * 2, dim)
        c3 = c[:, n2:n2 + n3].reshape(B, H, W, dim)
        c4 = c[:, n2 + n3:].reshape(B, H // 2, W // 2, dim)
        c1 = self.up(c2) + c1

        if self.add_vit_feature:
            if self.version != "new" and len(outs) == 4:
                x1, x2, x3, x4 = outs
            else:  # det version='new': broadcast the final map
                x1 = x2 = x3 = x4 = outs[-1]
            x1 = resize_2d(x1, (H * 4, W * 4), "bilinear")
            x2 = resize_2d(x2, (H * 2, W * 2), "bilinear")
            x4 = resize_2d(x4, (H // 2, W // 2), "bilinear")
            c1, c2, c3, c4 = c1 + x1, c2 + x2, c3 + x3, c4 + x4

        use_ra = det
        return [
            self.norm1(c1, use_running_average=use_ra),
            self.norm2(c2, use_running_average=use_ra),
            self.norm3(c3, use_running_average=use_ra),
            self.norm4(c4, use_running_average=use_ra),
        ]
