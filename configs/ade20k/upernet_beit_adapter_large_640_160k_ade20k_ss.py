# UperNet + BEiT-Adapter-L on ADE20K, 640 crop, 160k iters (single-scale).
# Counterpart of reference `upernet_beit_adapter_large_640_160k_ade20k_ss.py`.
_base_ = [
    "../_base_/datasets/ade20k.py",
    "../_base_/schedules/schedule_160k.py",
]
pretrained = "pretrained/beit_large_patch16_224_pt22k_ft22k.pth"
model = dict(
    type="EncoderDecoder",
    backbone=dict(
        type="BEiTAdapter",
        img_size=640,
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
    decode_head=dict(type="UPerHead", num_classes=150, channels=1024,
                     pool_scales=[1, 2, 3, 6], dropout_ratio=0.1),
    auxiliary_head=dict(type="FCNHead", num_classes=150, channels=256,
                        num_convs=1, dropout_ratio=0.1),
    aux_in_index=2,
)
aux_loss_weight = 0.4
data = dict(samples_per_chip=1, crop_size=[640, 640], scale=[2048, 640])
optimizer = dict(lr=2e-5, weight_decay=0.05, layer_decay_rate=0.90)
test_cfg = dict(mode="slide", crop_size=[640, 640], stride=[426, 426])
