# Pascal Context 59 (counterpart of reference
# `_base_/datasets/pascal_context_59.py`).
data = dict(
    dataset_type="PascalContextDataset",
    data_root="data/VOCdevkit/VOC2010",
    train=dict(img_dir="JPEGImages", ann_dir="SegmentationClassContext"),
    val=dict(img_dir="JPEGImages", ann_dir="SegmentationClassContext"),
    samples_per_chip=2,
    crop_size=[480, 480],
    scale=[520, 520],
    # every reference pc ViT-Adapter config overrides the test pipeline to
    # img_scale=(4096, 520) (e.g. upernet_beit_adapter_large_480_80k_..._ss.py)
    test_scale=[4096, 520],
    ratio_range=[0.5, 2.0],
    cat_max_ratio=0.75,
)
num_classes = 59
