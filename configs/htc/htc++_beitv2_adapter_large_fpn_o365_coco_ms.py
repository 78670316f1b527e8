# HTC++ + BEiTv2-Adapter-L (O365 pre) with multi-scale TTA. BASELINE: 62.6
# box / 54.2 mask AP minival (`detection/README.md:157-168`). Counterpart of
# reference `htc++_beitv2_adapter_large_fpn_o365_coco_ms.py`.
_base_ = ["./htc++_beitv2_adapter_large_fpn_o365_coco.py"]
tta = dict(scales=[[400, 1600], [600, 1600], [800, 1600], [1000, 1600],
                   [1200, 1600], [1400, 1600]],
           scale_ranges=[['l'], ['l'], ['m', 'l'],
                         ['s', 'm'], ['s', 'm'], ['s', 'm']])
