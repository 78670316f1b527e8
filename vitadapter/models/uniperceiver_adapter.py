"""UniPerceiverAdapter: multimodal trunk + spatial-prior adapter.

Parity target: `UniPerceiverAdapter`
(reference `wsdm2023/mmdet_custom/models/backbones/uniperceiver_adapter.py:101-160`):
same adapter skeleton as ViTAdapter, with text tokens threaded through each
trunk span (reference `adapter_modules.py:183-198` wsdm variant), an optional
`GroundingCrossAttention` stack after the interactions (`:120-123`), and
`out_indices` subsetting the emitted scales (`:146-160`).
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitadapter.layers.norm import BatchNorm
from vitadapter.models.adapter import (InteractionBlock, SpatialPriorModule,
                                       deform_inputs)
from vitadapter.models.uniperceiver import (GroundingCrossAttention,
                                            UnifiedBertEncoder)
from vitadapter.utils.resize import resize_2d


class UniPerceiverAdapter(nn.Module):
    # trunk knobs
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    window_attn: Sequence[bool] | bool = False
    window_size: Sequence[int] | int = 14
    vocab_size: int = 49411
    with_cp: bool = False
    # adapter knobs
    conv_inplane: int = 64
    n_points: int = 4
    deform_num_heads: int = 6
    init_values: float = 0.0
    interaction_indexes: Sequence[Sequence[int]] = ((0, 2), (3, 5), (6, 8),
                                                    (9, 11))
    with_cffn: bool = True
    cffn_ratio: float = 0.25
    deform_ratio: float = 1.0
    add_vit_feature: bool = True
    use_extra_extractor: bool = True
    num_grounding_blocks: int = 0
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.trunk = UnifiedBertEncoder(
            patch_size=self.patch_size, embed_dim=self.embed_dim,
            depth=self.depth, num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio, drop_path_rate=self.drop_path_rate,
            window_attn=self.window_attn, window_size=self.window_size,
            vocab_size=self.vocab_size, with_cp=self.with_cp, dtype=self.dtype)
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
                init_values=self.init_values, drop_path=self.drop_path_rate,
                with_cffn=self.with_cffn, cffn_ratio=self.cffn_ratio,
                deform_ratio=self.deform_ratio,
                extra_extractor=(i == n_inter - 1) and self.use_extra_extractor,
                dtype=self.dtype, name=f"interactions_{i}")
            for i in range(n_inter)
        ]
        self.grounding_blocks = [
            GroundingCrossAttention(num_heads=self.num_heads,
                                    dtype=self.dtype,
                                    name=f"grounding_{i}")
            for i in range(self.num_grounding_blocks)
        ]
        self.up = nn.ConvTranspose(self.embed_dim, (2, 2), strides=(2, 2),
                                   dtype=self.dtype)
        self.norm1 = BatchNorm()
        self.norm2 = BatchNorm()
        self.norm3 = BatchNorm()
        self.norm4 = BatchNorm()

    def __call__(self, img: jax.Array, refer: jax.Array,
                 r_mask: Optional[jax.Array] = None, train: bool = False):
        """img (B, H, W, 3); refer (B, T) CLIP-BPE ids; r_mask (B, T)."""
        B, H_img, W_img, _ = img.shape
        det = not train
        injector_inputs, extractor_inputs = deform_inputs(H_img, W_img)

        c1, c2, c3, c4 = self.spm(img, train=train)
        c2 = c2 + self.level_embed[0]
        c3 = c3 + self.level_embed[1]
        c4 = c4 + self.level_embed[2]
        c = jnp.concatenate([c2, c3, c4], axis=1)
        n2, n3 = c2.shape[1], c3.shape[1]

        x, H, W = self.trunk.visual_embed(img)
        q = self.trunk.token_embed(refer)
        dim = x.shape[-1]

        state = {"q": q}
        for i, layer in enumerate(self.interactions):
            a, b = self.interaction_indexes[i]

            def blocks_fn(tokens, _a=a, _b=b):
                tokens, state["q"] = self.trunk.run_layers(
                    tokens, state["q"], r_mask, H, W, _a, _b + 1,
                    deterministic=det)
                return tokens

            x, c = layer(x, c, blocks_fn, injector_inputs, extractor_inputs,
                         H, W, deterministic=det)
        q = state["q"]

        for g in self.grounding_blocks:
            x = g(x, q, r_mask)

        c2 = c[:, :n2].reshape(B, H * 2, W * 2, dim)
        c3 = c[:, n2:n2 + n3].reshape(B, H, W, dim)
        c4 = c[:, n2 + n3:].reshape(B, H // 2, W // 2, dim)
        c1 = self.up(c2) + c1

        if self.add_vit_feature:
            x3 = x.reshape(B, H, W, dim)
            c1 = c1 + resize_2d(x3, (H * 4, W * 4), "bilinear")
            c2 = c2 + resize_2d(x3, (H * 2, W * 2), "bilinear")
            c3 = c3 + x3
            c4 = c4 + resize_2d(x3, (H // 2, W // 2), "bilinear")

        use_ra = det
        feats = [
            self.norm1(c1, use_running_average=use_ra),
            self.norm2(c2, use_running_average=use_ra),
            self.norm3(c3, use_running_average=use_ra),
            self.norm4(c4, use_running_average=use_ra),
        ]
        return [feats[i] for i in self.out_indices]
