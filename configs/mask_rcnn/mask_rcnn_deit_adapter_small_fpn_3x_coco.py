# Mask R-CNN + ViT-Adapter-S (DeiT-S), 3x+MS. BASELINE: 48.2 box / 42.8
# mask AP (`detection/README.md:177`). Counterpart of reference
# `mask_rcnn_deit_adapter_small_fpn_3x_coco.py`.
_base_ = [
    "../_base_/models/mask_rcnn_vit_adapter.py",
    "../_base_/datasets/coco_instance.py",
    "../_base_/schedules/schedule_3x.py",
    "../_base_/default_runtime.py",
]
model = dict(
    backbone=dict(
        embed_dim=384,
        num_heads=6,
        drop_path_rate=0.2,
    ),
)
pretrained = "pretrained/deit_small_patch16_224-cd65a155.pth"
