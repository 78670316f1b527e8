# Mask R-CNN + ViT-Adapter-T (DeiT) on COCO, 3x+MS. BASELINE: 46.0 box /
# 41.0 mask AP (`detection/README.md:176`). Counterpart of reference
# `mask_rcnn_deit_adapter_tiny_fpn_3x_coco.py`
# (window attention [14,14,None]x4, drop_path 0.1).
_base_ = [
    "../_base_/models/mask_rcnn_vit_adapter.py",
    "../_base_/datasets/coco_instance.py",
    "../_base_/schedules/schedule_3x.py",
    "../_base_/default_runtime.py",
]
pretrained = "pretrained/deit_tiny_patch16_224-a1311bcf.pth"
