# Mapillary Vistas 896x896 with the 65->19 Cityscapes class fold
# (counterpart of reference `_base_/datasets/mapillary_896x896.py` +
# `MapillaryHack`; the fold lives in `data/datasets.py::MapillaryDataset`).
data = dict(
    dataset_type="MapillaryDataset",
    data_root="data/mapillary",
    train=dict(img_dir="training/images", ann_dir="training/labels"),
    val=dict(img_dir="validation/images", ann_dir="validation/labels"),
    samples_per_chip=1,
    crop_size=[896, 896],
    scale=[2048, 1024],
    ratio_range=[0.5, 2.0],
    cat_max_ratio=0.75,
)
num_classes = 19
