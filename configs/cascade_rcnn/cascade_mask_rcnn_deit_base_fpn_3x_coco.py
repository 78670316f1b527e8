# Cascade Mask R-CNN + plain DeiT-B baseline (no adapter). Counterpart of
# reference `cascade_rcnn/cascade_mask_rcnn_deit_base_fpn_3x_coco.py`.
_base_ = [
    "../_base_/models/cascade_mask_rcnn_vit_adapter.py",
    "../_base_/datasets/coco_instance.py",
    "../_base_/schedules/schedule_3x.py",
    "../_base_/default_runtime.py",
]
model = dict(
    backbone=dict(
        _delete_=True,
        type="ViTBaseline",
        dtype="bfloat16",
        patch_size=16,
        embed_dim=768,
        depth=12,
        num_heads=12,
        drop_path_rate=0.3,
        layer_scale=False,
        window_attn=[True, True, False] * 4,
        window_size=[14, 14, None] * 4,
    ),
)
pretrained = "pretrained/deit_base_patch16_224-b5f2ef4d.pth"
