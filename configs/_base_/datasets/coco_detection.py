# COCO detection (bbox only) dataset (counterpart of mmdet
# `_base_/datasets/coco_detection.py`) — single-stage detectors.
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
evaluation = dict(metric=["bbox"])
num_classes = 80
