# HTC++ + ViT-Adapter-L (AugReg) with multi-scale TTA. BASELINE: 57.7 box /
# 49.9 mask AP minival (`detection/README.md:68-79`). Counterpart of
# reference `htc++_augreg_adapter_large_fpn_3x_coco_ms.py`.
_base_ = ["./htc++_augreg_adapter_large_fpn_3x_coco.py"]
tta = dict(scales=[[400, 1600], [600, 1600], [800, 1600], [1000, 1600],
                   [1200, 1600], [1400, 1600]],
           scale_ranges=[['l'], ['l'], ['m', 'l'],
                         ['s', 'm'], ['s', 'm'], ['s', 'm']])
