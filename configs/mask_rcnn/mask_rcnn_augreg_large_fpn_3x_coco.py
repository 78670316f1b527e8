# Mask R-CNN + plain AugReg-L baseline (no adapter). Counterpart of
# reference `mask_rcnn_augreg_large_fpn_3x_coco.py`.
_base_ = ["./mask_rcnn_deit_tiny_fpn_3x_coco.py"]
model = dict(
    dtype="float32",  # ref trains AugReg-L without fp16
    backbone=dict(
        dtype="float32",
        embed_dim=1024,
        depth=24,
        num_heads=16,
        drop_path_rate=0.4,
        pretrain_size=384,
        with_cp=True,
        window_attn=([True] * 5 + [False]) * 4,
        window_size=([14] * 5 + [None]) * 4,
    ),
)
data = dict(samples_per_chip=1)
optimizer = dict(layer_decay_rate=0.9)
pretrained = ("pretrained/L_16-i21k-300ep-lr_0.001-aug_medium1-wd_0.1-do_0.1"
              "-sd_0.1--imagenet2012-steps_20k-lr_0.01-res_384.pth")
