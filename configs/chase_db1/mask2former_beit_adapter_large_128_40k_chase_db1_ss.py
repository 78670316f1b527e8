# Mask2Former + BEiT-Adapter-L on CHASE_DB1 vessel segmentation (128 crop).
# Counterpart of reference `mask2former_beit_adapter_large_128_40k_chase_db1_ss.py`.
_base_ = ["../mask2former/mask2former_beit_adapter_large_896_80k_ade20k_ss.py"]
model = dict(backbone=dict(img_size=128), decode_head=dict(num_classes=2))
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
test_cfg = dict(mode="slide", crop_size=[128, 128], stride=[85, 85])
