# Multi-scale (+flip) TTA variant of the plain-BEiT-L UperNet baseline.
# Counterpart of reference `upernet_beit_large_512_160k_ade20k_ms.py`.
_base_ = ["./upernet_beit_large_512_160k_ade20k_ss.py"]
aug_test = dict(img_ratios=[0.5, 0.75, 1.0, 1.25, 1.5, 1.75], flip=True)
