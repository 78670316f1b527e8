# Multi-scale (+flip) TTA variant of the Cityscapes Mask2Former.
# Counterpart of reference `mask2former_beit_adapter_large_896_80k_cityscapes_ms.py`.
_base_ = ["./mask2former_beit_adapter_large_896_80k_cityscapes_ss.py"]
# the cityscapes MS recipe adds ratio 2.0 (reference `..._cityscapes_ms.py`)
aug_test = dict(img_ratios=[0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0], flip=True)
