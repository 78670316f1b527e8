# COCO-Stuff-10K (counterpart of reference
# `_base_/datasets/coco-stuff10k.py`).
data = dict(
    dataset_type="COCOStuffDataset",
    data_root="data/coco_stuff10k",
    train=dict(img_dir="images/train2014", ann_dir="annotations/train2014"),
    val=dict(img_dir="images/test2014", ann_dir="annotations/test2014"),
    samples_per_chip=2,
    crop_size=[512, 512],
    scale=[2048, 512],
    ratio_range=[0.5, 2.0],
    cat_max_ratio=0.75,
)
num_classes = 171
