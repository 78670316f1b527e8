# UperNet + BEiT-Adapter-L on COCO-Stuff-10K, 512 crop, 80k iters.
# Counterpart of reference `upernet_beit_adapter_large_512_80k_cocostuff10k_ss.py`.
_base_ = ["../ade20k/upernet_beit_adapter_large_640_160k_ade20k_ss.py"]
model = dict(
    backbone=dict(img_size=512),
    decode_head=dict(num_classes=171),
    auxiliary_head=dict(num_classes=171),
)
data = dict(
    _delete_=True,
    dataset_type="COCOStuffDataset",
    data_root="data/coco_stuff10k",
    train=dict(img_dir="images/train2014", ann_dir="annotations/train2014"),
    val=dict(img_dir="images/test2014", ann_dir="annotations/test2014"),
    samples_per_chip=2, crop_size=[512, 512], scale=[2048, 512],
    ratio_range=[0.5, 2.0], cat_max_ratio=0.75)
runner = dict(max_iters=80000)
num_classes = 171
test_cfg = dict(mode="slide", crop_size=[512, 512], stride=[341, 341])
