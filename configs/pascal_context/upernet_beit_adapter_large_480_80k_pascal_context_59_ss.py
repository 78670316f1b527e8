# UperNet + BEiT-Adapter-L on Pascal Context 59, 480 crop, 80k iters.
# Counterpart of reference `upernet_beit_adapter_large_480_80k_pascal_context_59_ss.py`.
_base_ = ["../ade20k/upernet_beit_adapter_large_640_160k_ade20k_ss.py"]
model = dict(
    backbone=dict(img_size=480),
    decode_head=dict(num_classes=59),
    auxiliary_head=dict(num_classes=59),
)
data = dict(
    _delete_=True,
    dataset_type="PascalContextDataset",
    data_root="data/VOCdevkit/VOC2010",
    train=dict(img_dir="JPEGImages", ann_dir="SegmentationClassContext"),
    val=dict(img_dir="JPEGImages", ann_dir="SegmentationClassContext"),
    samples_per_chip=2, crop_size=[480, 480], scale=[2048, 480],
    ratio_range=[0.5, 2.0], cat_max_ratio=0.75)
runner = dict(max_iters=80000)
num_classes = 59
test_cfg = dict(mode="slide", crop_size=[480, 480], stride=[320, 320])
