# MaskFormer + BEiT-Adapter-L on ADE20K (the Mask2Former predecessor head;
# reference ships `maskformer_beit.py` as a selectable model base).
_base_ = [
    "../_base_/models/maskformer_beit.py",
    "../_base_/datasets/ade20k.py",
    "../_base_/schedules/schedule_160k.py",
]
model = dict(backbone=dict(img_size=640))
data = dict(crop_size=[640, 640], scale=[2048, 640])
test_cfg = dict(mode="slide", crop_size=[640, 640], stride=[426, 426])
pretrained = "pretrained/beit_large_patch16_224_pt22k_ft22k.pth"
