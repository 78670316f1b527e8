# Mask R-CNN + ViT-Adapter-L (AugReg-L/384), 3x+MS. BASELINE: 52.1 box /
# 46.0 mask AP (`detection/README.md:180`). Counterpart of reference
# `mask_rcnn_augreg_adapter_large_fpn_3x_coco.py`.
_base_ = [
    "../_base_/models/mask_rcnn_vit_adapter.py",
    "../_base_/datasets/coco_instance.py",
    "../_base_/schedules/schedule_3x.py",
    "../_base_/default_runtime.py",
]
model = dict(
    dtype="float32",  # ref trains AugReg-L without fp16
    backbone=dict(
        dtype="float32",
        img_size=384,
        pretrain_size=384,
        embed_dim=1024,
        depth=24,
        num_heads=16,
        drop_path_rate=0.4,
        deform_num_heads=16,
        deform_ratio=0.5,
        with_cp=True,
        interaction_indexes=[[0, 5], [6, 11], [12, 17], [18, 23]],
        window_attn=([True] * 5 + [False]) * 4,
        window_size=([14] * 5 + [None]) * 4,
    ),
)
data = dict(samples_per_chip=1)
optimizer = dict(layer_decay_rate=0.9)
pretrained = ("pretrained/L_16-i21k-300ep-lr_0.001-aug_medium1-wd_0.1-do_0.1"
              "-sd_0.1--imagenet2012-steps_20k-lr_0.01-res_384.pth")
