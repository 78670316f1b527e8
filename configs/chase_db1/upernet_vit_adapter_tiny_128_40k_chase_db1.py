# UperNet + ViT-Adapter-T on CHASE DB1 vessel segmentation.
_base_ = ["../ade20k/upernet_vit_adapter_tiny_512_160k_ade20k.py"]
model = dict(decode_head=dict(num_classes=2), auxiliary_head=dict(num_classes=2))
data = dict(
    _delete_=True,
    dataset_type="ChaseDB1Dataset",
    data_root="data/CHASE_DB1",
    train=dict(img_dir="images/training", ann_dir="annotations/training"),
    val=dict(img_dir="images/validation", ann_dir="annotations/validation"),
    samples_per_chip=4, crop_size=[128, 128], scale=[960, 999],
    ratio_range=[0.5, 2.0], cat_max_ratio=0.75)
runner = dict(max_iters=40000)
num_classes = 2
