# Mask2Former + BEiT-Adapter-L on Cityscapes (counterpart of the reference
# cityscapes collection; Mapillary pretraining via MapillaryDataset).
_base_ = ["../mask2former/mask2former_beit_adapter_large_896_80k_ade20k_ss.py"]
model = dict(decode_head=dict(num_classes=19))
data = dict(
    _delete_=True,
    dataset_type="CityscapesDataset",
    data_root="data/cityscapes",
    train=dict(img_dir="leftImg8bit/train", ann_dir="gtFine/train"),
    val=dict(img_dir="leftImg8bit/val", ann_dir="gtFine/val"),
    samples_per_chip=1, crop_size=[896, 896], scale=[3584, 896],
    ratio_range=[0.5, 2.0], cat_max_ratio=0.75)
num_classes = 19
