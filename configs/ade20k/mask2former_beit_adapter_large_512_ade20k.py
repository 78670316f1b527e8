# Mask2Former + BEiT-Adapter-L at 512 crop (the bench flagship shape).
_base_ = ["../mask2former/mask2former_beit_adapter_large_896_80k_ade20k_ss.py"]
model = dict(backbone=dict(img_size=512))
data = dict(crop_size=[512, 512], scale=[2048, 512])
test_cfg = dict(mode="slide", crop_size=[512, 512], stride=[341, 341])
