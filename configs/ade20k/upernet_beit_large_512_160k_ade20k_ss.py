# UperNet + plain BEiT-L (NO adapter) baseline on ADE20K 512, 160k iters.
# Counterpart of reference `upernet_beit_large_512_160k_ade20k_ss.py`
# (mmseg BEiT out_indices [7, 11, 15, 23] feed the 4 pyramid scales).
_base_ = [
    "../_base_/datasets/ade20k.py",
    "../_base_/schedules/schedule_160k.py",
]
pretrained = "pretrained/beit_large_patch16_224_pt22k_ft22k.pth"
model = dict(
    type="EncoderDecoder",
    backbone=dict(
        type="BEiTBaseline",
        img_size=512,
        patch_size=16,
        embed_dim=1024,
        depth=24,
        num_heads=16,
        use_rel_pos_bias=True,
        init_values=1e-6,
        drop_path_rate=0.2,
        out_indices=[7, 11, 15, 23],
        with_cp=True,
    ),
    decode_head=dict(type="UPerHead", num_classes=150, channels=1024,
                     pool_scales=[1, 2, 3, 6], dropout_ratio=0.1),
    auxiliary_head=dict(type="FCNHead", num_classes=150, channels=256,
                        num_convs=1, dropout_ratio=0.1),
    aux_in_index=2,
)
aux_loss_weight = 0.4
optimizer = dict(lr=2e-5, weight_decay=0.05, layer_decay_rate=0.90)
test_cfg = dict(mode="slide", crop_size=[512, 512], stride=[341, 341])
