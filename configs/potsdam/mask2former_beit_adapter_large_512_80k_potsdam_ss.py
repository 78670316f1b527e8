# Mask2Former + BEiT-Adapter-L on ISPRS Potsdam (6 classes), 512 crop.
# Counterpart of reference `mask2former_beit_adapter_large_512_80k_potsdam_ss.py`.
_base_ = ["../mask2former/mask2former_beit_adapter_large_896_80k_ade20k_ss.py"]
model = dict(backbone=dict(img_size=512), decode_head=dict(num_classes=6))
data = dict(
    _delete_=True,
    dataset_type="PotsdamDataset",
    data_root="data/potsdam",
    train=dict(img_dir="img_dir/train", ann_dir="ann_dir/train"),
    val=dict(img_dir="img_dir/val", ann_dir="ann_dir/val"),
    samples_per_chip=2, crop_size=[512, 512], scale=[512, 512],
    ratio_range=[0.5, 2.0], cat_max_ratio=0.75)
num_classes = 6
test_cfg = dict(mode="slide", crop_size=[512, 512], stride=[341, 341])
