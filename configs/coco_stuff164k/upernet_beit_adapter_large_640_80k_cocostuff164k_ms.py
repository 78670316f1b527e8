# Multi-scale (+flip) TTA variant of the COCO-Stuff-164K UperNet.
# Counterpart of reference `upernet_beit_adapter_large_640_80k_cocostuff164k_ms.py`.
_base_ = ["./upernet_beit_adapter_large_640_80k_cocostuff164k_ss.py"]
aug_test = dict(img_ratios=[0.5, 0.75, 1.0, 1.25, 1.5, 1.75], flip=True)
