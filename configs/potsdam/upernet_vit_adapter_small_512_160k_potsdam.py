# UperNet + ViT-Adapter-S on ISPRS Potsdam (counterpart of the reference
# potsdam collection with the custom PotsdamDataset).
_base_ = ["../ade20k/upernet_vit_adapter_tiny_512_160k_ade20k.py"]
model = dict(
    backbone=dict(embed_dim=384, num_heads=6, drop_path_rate=0.2),
    decode_head=dict(num_classes=6),
    auxiliary_head=dict(num_classes=6))
data = dict(
    _delete_=True,
    dataset_type="PotsdamDataset",
    data_root="data/potsdam",
    train=dict(img_dir="img_dir/train", ann_dir="ann_dir/train"),
    val=dict(img_dir="img_dir/val", ann_dir="ann_dir/val"),
    samples_per_chip=2, crop_size=[512, 512], scale=[512, 512],
    ratio_range=[0.5, 2.0], cat_max_ratio=0.75)
num_classes = 6
