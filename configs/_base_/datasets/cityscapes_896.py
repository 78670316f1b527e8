# Cityscapes 896x896 (counterpart of reference
# `_base_/datasets/cityscapes_896x896.py`).
data = dict(
    dataset_type="CityscapesDataset",
    data_root="data/cityscapes",
    train=dict(img_dir="leftImg8bit/train", ann_dir="gtFine/train"),
    val=dict(img_dir="leftImg8bit/val", ann_dir="gtFine/val"),
    samples_per_chip=1,
    crop_size=[896, 896],
    scale=[2048, 1024],
    ratio_range=[0.5, 2.0],
    cat_max_ratio=0.75,
)
num_classes = 19
