# Mask R-CNN + ViT-Adapter-T (DeiT) on COCO, 3x schedule.
# Counterpart of reference `mask_rcnn_deit_adapter_tiny_fpn_3x_coco.py`
# (window attention [14,14,None]x4, drop_path 0.1).
model = dict(
    type="MaskRCNN",
    num_classes=80,
    fpn_channels=256,
    backbone=dict(
        type="ViTAdapter",
        patch_size=16,
        embed_dim=192,
        depth=12,
        num_heads=3,
        drop_path_rate=0.1,
        layer_scale=False,
        conv_inplane=64,
        n_points=4,
        deform_num_heads=6,
        cffn_ratio=0.25,
        deform_ratio=1.0,
        interaction_indexes=[[0, 2], [3, 5], [6, 8], [9, 11]],
        window_attn=[True, True, False] * 4,
        window_size=[14, 14, None] * 4,
    ),
)
data = dict(
    dataset_type="CocoDataset",
    data_root="data/coco",
    train=dict(ann_file="annotations/instances_train2017.json",
               img_dir="train2017"),
    val=dict(ann_file="annotations/instances_val2017.json",
             img_dir="val2017"),
    samples_per_chip=2,
    crop_size=[1024, 1024],
    max_instances=100,
)
optimizer = dict(type="AdamW", lr=1e-4, betas=[0.9, 0.999],
                 weight_decay=0.05, layer_decay_rate=1.0, grad_clip=None)
lr_config = dict(policy="step", warmup_iters=500, steps=[27, 33])
runner = dict(max_epochs=36)
pretrained = "pretrained/deit_tiny_patch16_224-a1311bcf.pth"
