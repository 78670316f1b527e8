# Mask2Former + BEiT-Adapter base (counterpart of reference
# `_base_/models/mask2former_beit.py`).
model = dict(
    type="EncoderDecoderMask2Former",
    backbone=dict(
        type="BEiTAdapter",
        img_size=512,
        patch_size=16,
        embed_dim=1024,
        depth=24,
        num_heads=16,
        mlp_ratio=4.0,
        qkv_bias=True,
        use_abs_pos_emb=False,
        use_rel_pos_bias=True,
        init_values=1e-6,
        drop_path_rate=0.3,
        conv_inplane=64,
        n_points=4,
        deform_num_heads=16,
        cffn_ratio=0.25,
        deform_ratio=0.5,
        with_cp=True,
        interaction_indexes=[[0, 5], [6, 11], [12, 17], [18, 23]],
    ),
    decode_head=dict(
        type="Mask2FormerHead",
        num_classes=150,
        num_queries=100,
        feat_channels=256,
        out_channels=256,
        num_heads=8,
        decoder_ffn_dim=2048,
        pixel_encoder_ffn_dim=1024,
        pixel_encoder_heads=8,
    ),
)
train_cfg = dict(num_points=12544, oversample_ratio=3.0,
                 importance_sample_ratio=0.75, max_instances=60)
test_cfg = dict(mode="whole")
