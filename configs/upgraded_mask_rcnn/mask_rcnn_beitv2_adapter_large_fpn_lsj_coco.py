# Upgraded Mask R-CNN recipe (LSJ aug, BEiTv2-Adapter-L) — counterpart of
# the reference `upgraded_mask_rcnn` collection.
model = dict(
    type="MaskRCNN",
    num_classes=80,
    fpn_channels=256,
    backbone=dict(
        type="BEiTAdapter", img_size=1024, patch_size=16, embed_dim=1024,
        depth=24, num_heads=16, use_rel_pos_bias=True, init_values=1e-6,
        drop_path_rate=0.4, conv_inplane=64, deform_num_heads=16,
        deform_ratio=0.5, cffn_ratio=0.25, with_cp=True, use_cls_token=False,
        interaction_indexes=[[0, 5], [6, 11], [12, 17], [18, 23]],
        window_attn=([True] * 5 + [False]) * 4,
        window_size=([14] * 5 + [None]) * 4),
)
data = dict(
    dataset_type="CocoDataset",
    data_root="data/coco",
    train=dict(ann_file="annotations/instances_train2017.json", img_dir="train2017"),
    val=dict(ann_file="annotations/instances_val2017.json", img_dir="val2017"),
    samples_per_chip=1, crop_size=[1024, 1024], max_instances=100)
optimizer = dict(type="AdamW", lr=1e-4, weight_decay=0.05, layer_decay_rate=0.9)
pretrained = "pretrained/beitv2_large_patch16_224_pt1k_ft21k.pth"
