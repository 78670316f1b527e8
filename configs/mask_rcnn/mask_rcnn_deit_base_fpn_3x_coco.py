# Mask R-CNN + plain DeiT-B baseline (no adapter). Counterpart of reference
# `mask_rcnn_deit_base_fpn_3x_coco.py`.
_base_ = ["./mask_rcnn_deit_tiny_fpn_3x_coco.py"]
model = dict(
    backbone=dict(
        embed_dim=768,
        num_heads=12,
        drop_path_rate=0.3,
    ),
)
pretrained = "pretrained/deit_base_patch16_224-b5f2ef4d.pth"
