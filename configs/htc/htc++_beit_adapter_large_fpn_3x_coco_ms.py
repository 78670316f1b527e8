# HTC++ + BEiT-Adapter-L with multi-scale TTA. BASELINE: 60.2 box / 52.2
# mask AP minival (`detection/README.md:96-107`). Counterpart of reference
# `htc++_beit_adapter_large_fpn_3x_coco_ms.py` (per-scale box-size gates
# `:259-265` + soft-NMS merge).
_base_ = ["./htc++_beit_adapter_large_fpn_3x_coco.py"]
tta = dict(scales=[[400, 1600], [600, 1600], [800, 1600], [1000, 1600],
                   [1200, 1600], [1400, 1600]],
           scale_ranges=[['l'], ['l'], ['m', 'l'],
                         ['s', 'm'], ['s', 'm'], ['s', 'm']])
