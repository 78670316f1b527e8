# Mask2Former + BEiT-Adapter-L for Pascal Context 59 (1024-dim head, 100
# queries) — counterpart of reference `_base_/models/mask2former_beit_pascal
# .py` as overridden by `pascal_context/..._large_480_40k_..._ss.py:37-99`.
_base_ = ["./mask2former_beit.py"]
model = dict(
    backbone=dict(img_size=480),
    decode_head=dict(
        num_classes=59,
        num_queries=100,
        feat_channels=1024,
        out_channels=1024,
        num_heads=32,
        decoder_ffn_dim=4096,
        pixel_encoder_ffn_dim=4096,
        pixel_encoder_heads=32,
    ),
)
