# Mask2Former + BEiTv2-Adapter-L on ADE20K, 896 crop, 80k iters (the 61.5
# mIoU headline recipe; BEiTv2 pretrain, otherwise the BEiT 896 config).
# Counterpart of reference `mask2former_beitv2_adapter_large_896_80k_ade20k_ss.py`.
_base_ = ["../mask2former/mask2former_beit_adapter_large_896_80k_ade20k_ss.py"]
pretrained = "pretrained/beitv2_large_patch16_224_pt1k_ft21k.pth"
