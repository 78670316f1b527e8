# HTC++ + BEiT-Adapter-L, the released-checkpoint variant: drop_path 0.3 and
# the 'old' adapter forward (per-interaction ViT outputs instead of
# broadcasting the final map). Counterpart of reference
# `htc++_beit_adapter_large_fpn_3x_coco_old.py`.
_base_ = ["./htc++_beit_adapter_large_fpn_3x_coco.py"]
model = dict(
    backbone=dict(
        drop_path_rate=0.3,
        version="old",
    ),
)
