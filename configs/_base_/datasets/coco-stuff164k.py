# COCO-Stuff-164K (counterpart of reference
# `_base_/datasets/coco-stuff164k.py`).
data = dict(
    dataset_type="COCOStuffDataset",
    data_root="data/coco_stuff164k",
    train=dict(img_dir="images/train2017", ann_dir="annotations/train2017"),
    val=dict(img_dir="images/val2017", ann_dir="annotations/val2017"),
    samples_per_chip=1,
    crop_size=[896, 896],
    scale=[3584, 896],
    ratio_range=[0.5, 2.0],
    cat_max_ratio=0.75,
)
num_classes = 171
