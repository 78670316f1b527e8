# Cascade Mask R-CNN + ViT-Adapter-B, 3x+MS. BASELINE: 52.1 box / 44.8 mask
# AP (`detection/README.md:187`). Counterpart of reference
# `cascade_rcnn/cascade_mask_rcnn_deit_adapter_base_fpn_3x_coco.py`.
_base_ = [
    "../_base_/models/cascade_mask_rcnn_vit_adapter.py",
    "../_base_/datasets/coco_instance.py",
    "../_base_/schedules/schedule_3x.py",
    "../_base_/default_runtime.py",
]
model = dict(
    backbone=dict(
        embed_dim=768,
        num_heads=12,
        drop_path_rate=0.3,
        deform_num_heads=12,
    ),
)
pretrained = "pretrained/deit_base_patch16_224-b5f2ef4d.pth"
