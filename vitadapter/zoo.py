"""Model zoo: named configurations mirroring the reference's config tree.

Each entry reproduces a reference config's architecture knobs (cited), built
as plain constructors instead of mm-style string registries.
"""

from typing import Optional

import jax.numpy as jnp

from vitadapter.heads.upernet import FCNHead, UPerHead
from vitadapter.models.segmentor import EncoderDecoder
from vitadapter.models.vit_adapter import ViTAdapter

# Interaction spans for 12-layer (T/S/B) and 24-layer (L) trunks
# (reference upernet_deit_adapter_tiny...py interaction_indexes and
#  mask2former_beit_adapter_large_896...py `[[0,5],[6,11],[12,17],[18,23]]`).
IDX12 = ((0, 2), (3, 5), (6, 8), (9, 11))
IDX24 = ((0, 5), (6, 11), (12, 17), (18, 23))


VIT_ADAPTER_VARIANTS = {
    # name: (embed_dim, depth, num_heads, deform_num_heads, interaction_indexes,
    #        drop_path_rate)
    # deit-tiny/small/base + vit-large per reference configs
    "tiny": dict(embed_dim=192, depth=12, num_heads=3, deform_num_heads=6,
                 interaction_indexes=IDX12, drop_path_rate=0.1,
                 deform_ratio=1.0, layer_scale=False),
    "small": dict(embed_dim=384, depth=12, num_heads=6, deform_num_heads=6,
                  interaction_indexes=IDX12, drop_path_rate=0.2,
                  deform_ratio=1.0, layer_scale=False),
    "base": dict(embed_dim=768, depth=12, num_heads=12, deform_num_heads=12,
                 interaction_indexes=IDX12, drop_path_rate=0.3,
                 deform_ratio=0.5, layer_scale=False),
    "large": dict(embed_dim=1024, depth=24, num_heads=16, deform_num_heads=16,
                  interaction_indexes=IDX24, drop_path_rate=0.4,
                  deform_ratio=0.5, layer_scale=True),
}


def vit_adapter(variant: str = "tiny", dtype=jnp.float32, **overrides) -> ViTAdapter:
    cfg = dict(VIT_ADAPTER_VARIANTS[variant])
    cfg.update(overrides)
    return ViTAdapter(dtype=dtype, **cfg)


def mask2former_vit_adapter(variant: str = "large", num_classes: int = 150,
                            num_queries: Optional[int] = None,
                            dtype=jnp.float32, **overrides):
    """Mask2Former + ViT-Adapter segmentor.

    Head dims follow the reference flagship
    (`mask2former_beit_adapter_large_896_80k_ade20k_ss.py`: feat_channels 1024,
    32 heads, enc/dec FFN 4096, 200 queries for large) and the base config
    (`_base_/models/mask2former_beit.py`: 256 dims, 8 heads, enc FFN 1024,
    dec FFN 2048, 100 queries) otherwise.
    """
    from vitadapter.heads.mask2former import Mask2FormerHead
    from vitadapter.models.mask2former_segmentor import EncoderDecoderMask2Former

    backbone = vit_adapter(variant, dtype=dtype, **overrides)
    dim = backbone.embed_dim
    if variant == "large":
        head = Mask2FormerHead(
            num_classes=num_classes, num_queries=num_queries or 200,
            feat_channels=1024, out_channels=1024, num_heads=32,
            decoder_ffn_dim=4096, pixel_encoder_ffn_dim=4096,
            pixel_encoder_heads=32, dtype=dtype)
    else:
        head = Mask2FormerHead(
            num_classes=num_classes, num_queries=num_queries or 100,
            feat_channels=256, out_channels=256, num_heads=8,
            decoder_ffn_dim=2048, pixel_encoder_ffn_dim=1024,
            pixel_encoder_heads=8, dtype=dtype)
    return EncoderDecoderMask2Former(backbone=backbone, decode_head=head)


def upernet_vit_adapter(variant: str = "tiny", num_classes: int = 150,
                        channels: int = 512, dtype=jnp.float32,
                        **overrides) -> EncoderDecoder:
    """UperNet + ViT-Adapter semantic segmentor
    (reference `upernet_deit_adapter_tiny_512_160k_ade20k.py`)."""
    backbone = vit_adapter(variant, dtype=dtype, **overrides)
    dim = backbone.embed_dim
    return EncoderDecoder(
        backbone=backbone,
        decode_head=UPerHead(num_classes=num_classes, channels=channels,
                             dtype=dtype),
        auxiliary_head=FCNHead(num_classes=num_classes, channels=256,
                               dtype=dtype),
        aux_in_index=2,
    )
