# Mask2Former + BEiT-Adapter-L Mapillary pretraining stage (65-class taxonomy
# mapped onto the 19 Cityscapes classes at load time — the reference's
# `MapillaryHack` lives in `vitadapter/data/datasets.py::MapillaryDataset`).
# Counterpart of reference `mask2former_beit_adapter_large_896_80k_mapillary_ss.py`.
_base_ = ["./mask2former_beit_adapter_large_896_80k_cityscapes_ss.py"]
data = dict(
    _delete_=True,
    dataset_type="MapillaryDataset",
    data_root="data/mapillary",
    train=dict(img_dir="training/images", ann_dir="training/labels"),
    val=dict(img_dir="validation/images", ann_dir="validation/labels"),
    samples_per_chip=1, crop_size=[896, 896], scale=[3584, 896],
    ratio_range=[0.5, 2.0], cat_max_ratio=0.75)
