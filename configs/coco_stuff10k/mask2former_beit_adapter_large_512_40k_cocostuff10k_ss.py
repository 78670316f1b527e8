# Mask2Former + BEiT-Adapter-L on COCO-Stuff-10K, 512 crop, 40k. BASELINE:
# 53.2 mIoU SS (`segmentation/README.md:79`). Counterpart of reference
# `coco_stuff10k/mask2former_beit_adapter_large_512_40k_cocostuff10k_ss.py`.
_base_ = [
    "../_base_/models/mask2former_beit_cocostuff.py",
    "../_base_/datasets/coco-stuff10k.py",
    "../_base_/schedules/schedule_40k.py",
]
model = dict(backbone=dict(img_size=512))
test_cfg = dict(mode="slide", crop_size=[512, 512], stride=[341, 341])
pretrained = "pretrained/beit_large_patch16_224_pt22k_ft22k.pth"
