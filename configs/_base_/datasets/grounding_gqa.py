# GQA referring-expression grounding pre-training dataset (counterpart of
# reference `wsdm2023/configs/_base_/datasets/grounding_gqa.py`:
# VGDataset, max_sent_len=64, no paraphrase cache).
data = dict(
    dataset_type="VGDataset",
    data_root="data/grounding_gqa",
    train=dict(ann_file="annotations/train.json", img_dir="images"),
    val=dict(ann_file="annotations/val.json", img_dir="images"),
    samples_per_chip=2,
    crop_size=[1024, 1024],
    max_instances=1,
    max_sent_len=64,
    workers=4,
)
evaluation = dict(interval=1, metric=["IoU", "Acc"])
