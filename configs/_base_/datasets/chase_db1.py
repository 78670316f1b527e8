# CHASE DB1 retinal vessel segmentation (counterpart of reference
# `_base_/datasets/chase_db1.py`: 960x999 images, 128 crops).
data = dict(
    dataset_type="ChaseDB1Dataset",
    data_root="data/CHASE_DB1",
    train=dict(img_dir="images/training", ann_dir="annotations/training"),
    val=dict(img_dir="images/validation", ann_dir="annotations/validation"),
    samples_per_chip=4,
    crop_size=[128, 128],
    scale=[960, 999],
    ratio_range=[0.5, 2.0],
    cat_max_ratio=0.75,
)
num_classes = 2
