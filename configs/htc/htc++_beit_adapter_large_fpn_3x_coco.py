# HTC++-style cascade + BEiT-Adapter-L on COCO.
# Counterpart of reference `htc++_beit_adapter_large_fpn_3x_coco.py`
# (window pattern [14x5, 56] x 4, ExtraAttention on the coarsest level).
model = dict(
    type="CascadeRCNN",
    num_classes=80,
    fpn_channels=256,
    with_mask=True,
    use_extra_attention=True,
    backbone=dict(
        type="BEiTAdapter",
        img_size=224,
        patch_size=16,
        embed_dim=1024,
        depth=24,
        num_heads=16,
        use_rel_pos_bias=True,
        init_values=1e-6,
        drop_path_rate=0.4,
        conv_inplane=64,
        deform_num_heads=16,
        deform_ratio=0.5,
        cffn_ratio=0.25,
        with_cp=True,
        use_cls_token=False,
        interaction_indexes=[[0, 5], [6, 11], [12, 17], [18, 23]],
        window_attn=([True] * 5 + [True]) * 4,
        window_size=([14] * 5 + [56]) * 4,
    ),
)
data = dict(
    dataset_type="CocoDataset",
    data_root="data/coco",
    train=dict(ann_file="annotations/instances_train2017.json",
               img_dir="train2017"),
    val=dict(ann_file="annotations/instances_val2017.json",
             img_dir="val2017"),
    samples_per_chip=1,
    crop_size=[1600, 1400],
    max_instances=100,
)
optimizer = dict(type="AdamW", lr=2e-4, weight_decay=0.05,
                 layer_decay_rate=0.9)
# TTA (reference htc++ _ms config): per-scale ranges + soft-NMS merge
tta = dict(scales=[[400, 1600], [600, 1600], [800, 1600], [1000, 1600],
                   [1200, 1600], [1400, 1600]],
           scale_ranges=[[96, 10000], [96, 10000], [64, 10000], [64, 10000],
                         [0, 10000], [0, 256]])
pretrained = "pretrained/beitv2_large_patch16_224_pt1k_ft21k.pth"
