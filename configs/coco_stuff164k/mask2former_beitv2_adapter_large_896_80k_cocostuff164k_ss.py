# BEiTv2-pretrained variant of the COCO-Stuff-164K Mask2Former.
# Counterpart of reference `mask2former_beitv2_adapter_large_896_80k_cocostuff164k_ss.py`.
_base_ = ["./mask2former_beit_adapter_large_896_80k_cocostuff164k_ss.py"]
pretrained = "pretrained/beitv2_large_patch16_224_pt1k_ft21k.pth"
