# Mask2Former + BEiT-Adapter-L on CHASE_DB1 vessel segmentation, 128 crop,
# 40k. Counterpart of reference
# `chase_db1/mask2former_beit_adapter_large_128_40k_chase_db1_ss.py`
# (256-dim small-head recipe).
_base_ = [
    "../_base_/models/mask2former_beit_chase_db1.py",
    "../_base_/datasets/chase_db1.py",
    "../_base_/schedules/schedule_40k.py",
]
test_cfg = dict(mode="slide", crop_size=[128, 128], stride=[85, 85])
pretrained = "pretrained/beit_large_patch16_224_pt22k_ft22k.pth"
