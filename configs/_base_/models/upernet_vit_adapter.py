# UperNet + ViT-Adapter base model (counterpart of the reference
# `_base_/models/upernet_r50.py` with the ViTAdapter backbone swap).
model = dict(
    type="EncoderDecoder",
    backbone=dict(
        type="ViTAdapter",
        # TPU counterpart of the reference fp16 recipe (loss_scale 512):
        # bf16 compute, fp32 master params/softmax/losses — no loss scaling
        dtype="bfloat16",
        patch_size=16,
        embed_dim=192,
        depth=12,
        num_heads=3,
        mlp_ratio=4.0,
        drop_path_rate=0.1,
        layer_scale=False,
        conv_inplane=64,
        n_points=4,
        deform_num_heads=6,
        cffn_ratio=0.25,
        deform_ratio=1.0,
        interaction_indexes=[[0, 2], [3, 5], [6, 8], [9, 11]],
    ),
    decode_head=dict(
        type="UPerHead",
        dtype="bfloat16",
        num_classes=150,
        channels=512,
        pool_scales=[1, 2, 3, 6],
        dropout_ratio=0.1,
    ),
    auxiliary_head=dict(
        type="FCNHead",
        dtype="bfloat16",
        num_classes=150,
        channels=256,
        num_convs=1,
        dropout_ratio=0.1,
    ),
    aux_in_index=2,
)
aux_loss_weight = 0.4
test_cfg = dict(mode="whole")
