# Mask2Former + BEiT-Adapter-BASE on Pascal Context 59 (embed 768, 256-dim
# Mask2Former head with 8 heads / FFN 2048 — the small-head recipe).
# Counterpart of reference `mask2former_beit_adapter_base_480_40k_pascal_context_59_ss.py`.
_base_ = ["./mask2former_beit_adapter_large_480_40k_pascal_context_59_ss.py"]
pretrained = "pretrained/beit_base_patch16_224_pt22k_ft22k.pth"
model = dict(
    backbone=dict(
        embed_dim=768, depth=12, num_heads=12, drop_path_rate=0.2,
        deform_num_heads=12, deform_ratio=0.5,
        interaction_indexes=[[0, 2], [3, 5], [6, 8], [9, 11]]),
    decode_head=dict(
        feat_channels=256, out_channels=256, num_heads=8,
        decoder_ffn_dim=2048, pixel_encoder_ffn_dim=1024,
        pixel_encoder_heads=8),
)
