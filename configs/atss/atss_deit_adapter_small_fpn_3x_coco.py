# ATSS + ViT-Adapter-S on COCO (counterpart of the reference atss collection).
model = dict(
    type="ATSS",
    num_classes=80,
    dtype="bfloat16",
    fpn_channels=256,
    reg_max=0,
    backbone=dict(
        type="ViTAdapter", dtype="bfloat16", patch_size=16, embed_dim=384, depth=12,
        num_heads=6, drop_path_rate=0.2, layer_scale=False, conv_inplane=64,
        deform_num_heads=6, cffn_ratio=0.25, deform_ratio=1.0,
        interaction_indexes=[[0, 2], [3, 5], [6, 8], [9, 11]],
        window_attn=[True, True, False] * 4,
        window_size=[14, 14, None] * 4),
)
data = dict(dataset_type="CocoDataset", data_root="data/coco",
            train=dict(ann_file="annotations/instances_train2017.json", img_dir="train2017"),
            val=dict(ann_file="annotations/instances_val2017.json", img_dir="val2017"),
            samples_per_chip=2, crop_size=[1024, 1024], max_instances=100)
optimizer = dict(type="AdamW", lr=1e-4, weight_decay=0.05, layer_decay_rate=1.0)
pretrained = "pretrained/deit_small_patch16_224-cd65a155.pth"
