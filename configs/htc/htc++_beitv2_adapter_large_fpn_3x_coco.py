# HTC++ + BEiTv2-Adapter-L, 3x. BASELINE: 58.8 box / 51.1 mask AP minival
# (`detection/README.md:109-121`). Counterpart of reference
# `htc++_beitv2_adapter_large_fpn_3x_coco.py` (only diff vs beit: weights).
_base_ = ["./htc++_beit_adapter_large_fpn_3x_coco.py"]
pretrained = "pretrained/beitv2_large_patch16_224_pt1k_ft21k.pth"
