# COCO panoptic dataset (counterpart of mmdet
# `_base_/datasets/coco_panoptic.py`): 80 things + 53 stuff.
data = dict(
    dataset_type="CocoPanopticDataset",
    data_root="data/coco",
    train=dict(ann_file="annotations/panoptic_train2017.json",
               img_dir="train2017",
               seg_dir="annotations/panoptic_train2017"),
    val=dict(ann_file="annotations/panoptic_val2017.json",
             img_dir="val2017",
             seg_dir="annotations/panoptic_val2017"),
    samples_per_chip=1,
    crop_size=[1024, 1024],
    max_instances=100,
    workers=4,
)
panoptic = dict(num_things=80, num_stuff=53,
                object_mask_thr=0.8, iou_thr=0.8)
evaluation = dict(metric=["PQ"])
num_classes = 133
