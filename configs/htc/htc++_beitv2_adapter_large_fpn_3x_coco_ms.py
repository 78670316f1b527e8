# HTC++ + BEiTv2-Adapter-L with multi-scale TTA. BASELINE: 60.5 box / 52.5
# mask AP minival, 60.9 / 53.0 test-dev (`detection/README.md:123-143`).
# Counterpart of reference `htc++_beitv2_adapter_large_fpn_3x_coco_ms.py`.
_base_ = ["./htc++_beitv2_adapter_large_fpn_3x_coco.py"]
tta = dict(scales=[[400, 1600], [600, 1600], [800, 1600], [1000, 1600],
                   [1200, 1600], [1400, 1600]],
           scale_ranges=[['l'], ['l'], ['m', 'l'],
                         ['s', 'm'], ['s', 'm'], ['s', 'm']])
