# Multi-scale (+flip) TTA variant of the BEiTv2 896 Mask2Former (ratios near
# 1.0 as in the reference ms recipe).
# Counterpart of reference `mask2former_beitv2_adapter_large_896_80k_ade20k_ms.py`.
_base_ = ["./mask2former_beitv2_adapter_large_896_80k_ade20k_ss.py"]
aug_test = dict(img_ratios=[800.0 / 896, 832.0 / 896, 864.0 / 896, 1.0],
                flip=True)
