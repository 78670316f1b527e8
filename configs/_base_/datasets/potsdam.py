# ISPRS Potsdam (counterpart of reference `_base_/datasets/potsdam.py`).
data = dict(
    dataset_type="PotsdamDataset",
    data_root="data/potsdam",
    train=dict(img_dir="img_dir/train", ann_dir="ann_dir/train"),
    val=dict(img_dir="img_dir/val", ann_dir="ann_dir/val"),
    samples_per_chip=2,
    crop_size=[512, 512],
    scale=[512, 512],
    ratio_range=[0.5, 2.0],
    cat_max_ratio=0.75,
)
num_classes = 6
