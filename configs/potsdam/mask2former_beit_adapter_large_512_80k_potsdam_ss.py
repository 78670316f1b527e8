# Mask2Former + BEiT-Adapter-L on ISPRS Potsdam (6 classes), 512 crop, 80k.
# Counterpart of reference
# `potsdam/mask2former_beit_adapter_large_512_80k_potsdam_ss.py`
# (256-dim small-head recipe).
_base_ = [
    "../_base_/models/mask2former_beit_potsdam.py",
    "../_base_/datasets/potsdam.py",
    "../_base_/schedules/schedule_80k.py",
]
test_cfg = dict(mode="slide", crop_size=[512, 512], stride=[341, 341],
                # the reference config overrides the potsdam base test scale
                img_scale=[2048, 512])
pretrained = "pretrained/beit_large_patch16_224_pt22k_ft22k.pth"
