# Mask2Former + BEiT-Adapter-L for COCO-Stuff (171 classes, 1024-dim head,
# 100 queries) — counterpart of reference
# `_base_/models/mask2former_beit_cocostuff.py` as overridden by
# `coco_stuff10k/mask2former_beit_adapter_large_512_40k_cocostuff10k_ss.py`.
_base_ = ["./mask2former_beit.py"]
model = dict(
    decode_head=dict(
        num_classes=171,
        num_queries=100,
        feat_channels=1024,
        out_channels=1024,
        num_heads=32,
        decoder_ffn_dim=4096,
        pixel_encoder_ffn_dim=4096,
        pixel_encoder_heads=32,
    ),
)
