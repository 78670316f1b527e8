# The flagship with multi-scale + flip TTA. BASELINE: 60.5 mIoU MS
# (`segmentation/README.md:64`). Counterpart of reference
# `mask2former_beit_adapter_large_896_80k_ade20k_ms.py`.
_base_ = ["../mask2former/mask2former_beit_adapter_large_896_80k_ade20k_ss.py"]
aug_test = dict(img_ratios=[0.5, 0.75, 1.0, 1.25, 1.5, 1.75], flip=True)
