# Mask2Former + BEiT-Adapter-L on Cityscapes, 896 crop, 80k, fine-tuned from
# the Mapillary-pretrained checkpoint. BASELINE: 84.9 mIoU val SS
# (`segmentation/configs/cityscapes/README.md`). Counterpart of reference
# `cityscapes/mask2former_beit_adapter_large_896_80k_cityscapes_ss.py`.
_base_ = [
    "../_base_/models/mask2former_beit_cityscapes.py",
    "../_base_/datasets/cityscapes_896.py",
    "../_base_/schedules/schedule_80k.py",
]
test_cfg = dict(mode="slide", crop_size=[896, 896], stride=[512, 512])
pretrained = "pretrained/beit_large_patch16_224_pt22k_ft22k.pth"
# Mapillary-pretrain chain: start from the 80k Mapillary checkpoint
load_from = "pretrained/mask2former_beit_adapter_large_896_80k_mapillary.pth"
