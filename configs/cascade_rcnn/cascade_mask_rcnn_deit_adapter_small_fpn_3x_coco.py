# Cascade Mask R-CNN + ViT-Adapter-S, 3x+MS. BASELINE: 51.5 box / 44.3 mask
# AP (`detection/README.md:186`). Counterpart of reference
# `cascade_rcnn/cascade_mask_rcnn_deit_adapter_small_fpn_3x_coco.py`.
_base_ = [
    "../_base_/models/cascade_mask_rcnn_vit_adapter.py",
    "../_base_/datasets/coco_instance.py",
    "../_base_/schedules/schedule_3x.py",
    "../_base_/default_runtime.py",
]
pretrained = "pretrained/deit_small_patch16_224-cd65a155.pth"
