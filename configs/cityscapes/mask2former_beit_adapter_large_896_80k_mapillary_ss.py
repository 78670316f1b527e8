# Mask2Former + BEiT-Adapter-L Mapillary pretraining stage (65-class
# taxonomy folded onto the 19 Cityscapes classes at load time — the
# reference's `MapillaryHack` lives in `data/datasets.py::MapillaryDataset`).
# Counterpart of reference
# `cityscapes/mask2former_beit_adapter_large_896_80k_mapillary_ss.py`.
_base_ = [
    "../_base_/models/mask2former_beit_cityscapes.py",
    "../_base_/datasets/mapillary_896.py",
    "../_base_/schedules/schedule_80k.py",
]
test_cfg = dict(mode="slide", crop_size=[896, 896], stride=[512, 512])
pretrained = "pretrained/beit_large_patch16_224_pt22k_ft22k.pth"
