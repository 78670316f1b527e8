# HTC++ + ViT-Adapter-L (AugReg-L/384), 3x. BASELINE: 56.6 box / 49.0 mask
# AP minival (`detection/README.md:53-66`). Counterpart of reference
# `htc++_augreg_adapter_large_fpn_3x_coco.py` (plain ViT backbone, window
# pattern [14x5, global] x 4).
_base_ = [
    "../_base_/models/htc_beit_adapter.py",
    "../_base_/datasets/coco_instance.py",
    "../_base_/schedules/schedule_3x.py",
    "../_base_/default_runtime.py",
]
model = dict(
    backbone=dict(
        _delete_=True,
        type="ViTAdapter",
        img_size=384,
        pretrain_size=384,
        patch_size=16,
        embed_dim=1024,
        depth=24,
        num_heads=16,
        drop_path_rate=0.4,
        layer_scale=False,
        conv_inplane=64,
        n_points=4,
        deform_num_heads=16,
        cffn_ratio=0.25,
        deform_ratio=0.5,
        with_cp=True,
        interaction_indexes=[[0, 5], [6, 11], [12, 17], [18, 23]],
        window_attn=([True] * 5 + [False]) * 4,
        window_size=([14] * 5 + [None]) * 4,
    ),
)
data = dict(samples_per_chip=1, crop_size=[1600, 1400])
optimizer = dict(lr=2e-4, layer_decay_rate=0.9)
pretrained = ("pretrained/L_16-i21k-300ep-lr_0.001-aug_medium1-wd_0.1-do_0.1"
              "-sd_0.1--imagenet2012-steps_20k-lr_0.01-res_384.pth")
