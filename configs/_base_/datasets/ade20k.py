# ADE20K semantic segmentation dataset (counterpart of mmseg
# `_base_/datasets/ade20k.py`).
data = dict(
    dataset_type="ADE20KDataset",
    data_root="data/ade/ADEChallengeData2016",
    train=dict(
        img_dir="images/training",
        ann_dir="annotations/training",
    ),
    val=dict(
        img_dir="images/validation",
        ann_dir="annotations/validation",
    ),
    samples_per_chip=2,
    crop_size=[512, 512],
    scale=[2048, 512],
    ratio_range=[0.5, 2.0],
    cat_max_ratio=0.75,
)
num_classes = 150
