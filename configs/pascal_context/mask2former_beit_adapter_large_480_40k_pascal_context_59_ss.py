# Mask2Former + BEiT-Adapter-L on Pascal Context 59, 480 crop, 40k.
# BASELINE: 67.8 mIoU SS (`segmentation/README.md:95`). Counterpart of
# reference `mask2former_beit_adapter_large_480_40k_pascal_context_59_ss.py`.
_base_ = [
    "../_base_/models/mask2former_beit_pascal.py",
    "../_base_/datasets/pascal_context_59.py",
    "../_base_/schedules/schedule_40k.py",
]
test_cfg = dict(mode="slide", crop_size=[480, 480], stride=[320, 320])
pretrained = "pretrained/beit_large_patch16_224_pt22k_ft22k.pth"
