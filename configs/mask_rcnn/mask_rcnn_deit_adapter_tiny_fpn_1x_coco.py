# Mask R-CNN + ViT-Adapter-T (DeiT), 1x schedule.
# Counterpart of reference `mask_rcnn_deit_adapter_tiny_fpn_1x_coco.py`.
_base_ = [
    "../_base_/models/mask_rcnn_vit_adapter.py",
    "../_base_/datasets/coco_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(dtype="float32", backbone=dict(dtype="float32"))  # ref 1x has no fp16
pretrained = "pretrained/deit_tiny_patch16_224-a1311bcf.pth"
