# HTC++ skeleton with the BEiT-Adapter-L backbone (counterpart of the model
# block shared by every reference `htc++_*_fpn_3x_coco.py`: cascade + HTC
# semantic branch + ExtraAttention neck, window pattern [14x5, 56] x 4).
model = dict(
    type="CascadeRCNN",
    num_classes=80,
    fpn_channels=256,
    with_mask=True,
    with_semantic=True,
    use_extra_attention=True,
    backbone=dict(
        type="BEiTAdapter",
        img_size=224,
        patch_size=16,
        embed_dim=1024,
        depth=24,
        num_heads=16,
        use_rel_pos_bias=True,
        init_values=1e-6,
        drop_path_rate=0.4,
        conv_inplane=64,
        deform_num_heads=16,
        deform_ratio=0.5,
        cffn_ratio=0.25,
        with_cp=True,
        use_cls_token=False,
        version="new",
        interaction_indexes=[[0, 5], [6, 11], [12, 17], [18, 23]],
        window_attn=([True] * 5 + [True]) * 4,
        window_size=([14] * 5 + [56]) * 4,
    ),
)
