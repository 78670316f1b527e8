# UperNet + BEiT-Adapter-L on COCO-Stuff-164K, 640 crop, 80k iters.
# Counterpart of reference `upernet_beit_adapter_large_640_80k_cocostuff164k_ss.py`.
_base_ = ["../ade20k/upernet_beit_adapter_large_640_160k_ade20k_ss.py"]
model = dict(
    decode_head=dict(num_classes=171),
    auxiliary_head=dict(num_classes=171),
)
data = dict(
    _delete_=True,
    dataset_type="COCOStuffDataset",
    data_root="data/coco_stuff164k",
    train=dict(img_dir="images/train2017", ann_dir="annotations/train2017"),
    val=dict(img_dir="images/val2017", ann_dir="annotations/val2017"),
    samples_per_chip=1, crop_size=[640, 640], scale=[2048, 640],
    ratio_range=[0.5, 2.0], cat_max_ratio=0.75)
runner = dict(max_iters=80000)
num_classes = 171
