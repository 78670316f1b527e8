# Mask R-CNN + plain DeiT-S baseline (no adapter). Counterpart of reference
# `mask_rcnn_deit_small_fpn_3x_coco.py`.
_base_ = ["./mask_rcnn_deit_tiny_fpn_3x_coco.py"]
model = dict(
    backbone=dict(
        embed_dim=384,
        num_heads=6,
        drop_path_rate=0.2,
    ),
)
pretrained = "pretrained/deit_small_patch16_224-cd65a155.pth"
