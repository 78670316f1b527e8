# UperNet + Uni-Perceiver-Adapter-L on ADE20K 512, 160k iters.
# Counterpart of reference `upernet_uniperceiver_adapter_large_512_160k_ade20k.py`
# (layer_decay 0.8, lr 6e-5, wd 0.05).
_base_ = [
    "../_base_/datasets/ade20k.py",
    "../_base_/schedules/schedule_160k.py",
]
pretrained = "pretrained/uni-perceiver-large-L24-H1024-224size-pretrained_converted.pth"
model = dict(
    type="EncoderDecoder",
    backbone=dict(
        type="UniPerceiverAdapter",
        patch_size=16,
        embed_dim=1024,
        depth=24,
        num_heads=16,
        mlp_ratio=4.0,
        drop_path_rate=0.4,
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
optimizer = dict(lr=6e-5, weight_decay=0.05, layer_decay_rate=0.8)
test_cfg = dict(mode="slide", crop_size=[512, 512], stride=[341, 341])
