# Multi-scale (+flip) TTA variant of the BEiT-Adapter-B COCO-Stuff-10K model.
# Counterpart of reference `mask2former_beit_adapter_base_512_40k_cocostuff10k_ms.py`.
_base_ = ["./mask2former_beit_adapter_base_512_40k_cocostuff10k_ss.py"]
aug_test = dict(img_ratios=[0.5, 0.75, 1.0, 1.25, 1.5, 1.75], flip=True)
