# Mask R-CNN + plain DeiT-T baseline (no adapter). Counterpart of reference
# `mask_rcnn_deit_tiny_fpn_3x_coco.py` (ViTBaseline simple pyramid).
_base_ = [
    "../_base_/datasets/coco_instance.py",
    "../_base_/schedules/schedule_3x.py",
    "../_base_/default_runtime.py",
]
model = dict(
    type="MaskRCNN",
    num_classes=80,
    dtype="bfloat16",
    fpn_channels=256,
    backbone=dict(
        type="ViTBaseline",
        dtype="bfloat16",
        patch_size=16,
        embed_dim=192,
        depth=12,
        num_heads=3,
        drop_path_rate=0.1,
        layer_scale=False,
        window_attn=[True, True, False] * 4,
        window_size=[14, 14, None] * 4,
    ),
)
pretrained = "pretrained/deit_tiny_patch16_224-a1311bcf.pth"
