# Mask2Former + BEiTv2-Adapter-L COCO panoptic.
# Counterpart of reference
# `detection/configs/mask2former/mask2former_beitv2_adapter_large_16x1_3x_coco-panoptic.py`
# (100 things + 50... COCO: 80 things + 53 stuff = 133 classes; panoptic
# fusion via `vitadapter.heads.panoptic.panoptic_fuse`).
_base_ = ["./mask2former_beit_adapter_large_896_80k_ade20k_ss.py"]

num_things_classes = 80
num_stuff_classes = 53
model = dict(
    backbone=dict(img_size=1024, drop_path_rate=0.4),
    decode_head=dict(num_classes=133, num_queries=200),
)
data = dict(
    _delete_=True,
    dataset_type="CocoDataset",
    data_root="data/coco",
    train=dict(ann_file="annotations/panoptic_train2017.json",
               img_dir="train2017"),
    val=dict(ann_file="annotations/panoptic_val2017.json",
             img_dir="val2017"),
    samples_per_chip=1,
    crop_size=[1024, 1024],
    scale=[4096, 1024],
    ratio_range=[0.5, 2.0],
    cat_max_ratio=1.0,
    max_instances=100,
)
num_classes = 133
# panoptic post-processing (mmdet MaskFormerFusionHead defaults)
panoptic = dict(object_mask_thr=0.8, iou_thr=0.8,
                num_things=num_things_classes, num_stuff=num_stuff_classes)
