# COCO instance segmentation dataset (counterpart of mmdet
# `_base_/datasets/coco_instance.py` with the DETR-style AutoAugment
# train recipe folded into the host pipeline; static 1024 canvas).
data = dict(
    dataset_type="CocoDataset",
    data_root="data/coco",
    train=dict(ann_file="annotations/instances_train2017.json",
               img_dir="train2017"),
    val=dict(ann_file="annotations/instances_val2017.json",
             img_dir="val2017"),
    samples_per_chip=2,
    crop_size=[1024, 1024],
    max_instances=100,
    autoaug=True,
    workers=4,
)
evaluation = dict(metric=["bbox", "segm"])
num_classes = 80
