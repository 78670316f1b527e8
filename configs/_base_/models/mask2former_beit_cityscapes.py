# Mask2Former + BEiT-Adapter-L for Cityscapes (19 classes, 896 crops,
# 1024-dim head with 100 queries) — counterpart of reference
# `_base_/models/mask2former_beit_cityscapes.py` as overridden by
# `cityscapes/mask2former_beit_adapter_large_896_80k_cityscapes_ss.py:13-60`.
_base_ = ["./mask2former_beit.py"]
model = dict(
    backbone=dict(img_size=896),
    decode_head=dict(
        num_classes=19,
        num_queries=100,
        feat_channels=1024,
        out_channels=1024,
        num_heads=32,
        decoder_ffn_dim=4096,
        pixel_encoder_ffn_dim=4096,
        pixel_encoder_heads=32,
    ),
)
