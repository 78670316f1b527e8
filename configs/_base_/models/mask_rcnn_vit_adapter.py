# Mask R-CNN skeleton with a ViT-Adapter backbone slot (counterpart of
# mmdet `_base_/models/mask_rcnn_r50_fpn.py` with the backbone swap every
# reference mask_rcnn config performs). Variant configs override the
# backbone dims / window pattern / pretrained.
model = dict(
    type="MaskRCNN",
    num_classes=80,
    # TPU counterpart of the reference fp16 recipe: bf16 compute
    dtype="bfloat16",
    fpn_channels=256,
    backbone=dict(
        type="ViTAdapter",
        dtype="bfloat16",
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
