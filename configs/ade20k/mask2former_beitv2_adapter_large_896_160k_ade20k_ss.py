# 160k-iteration variant of the BEiTv2-Adapter-L 896 Mask2Former.
# Counterpart of reference `mask2former_beitv2_adapter_large_896_160k_ade20k_ss.py`.
_base_ = ["./mask2former_beitv2_adapter_large_896_80k_ade20k_ss.py"]
runner = dict(max_iters=160000)
