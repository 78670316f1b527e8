# Cascade Mask R-CNN skeleton (counterpart of mmdet
# `_base_/models/cascade_mask_rcnn_r50_fpn.py` + the backbone swap of
# `cascade_rcnn/cascade_mask_rcnn_deit_adapter_*_fpn_3x_coco.py`).
# Plain 3-stage cascade: no semantic branch / extra attention (those are the
# HTC++ additions).
model = dict(
    type="CascadeRCNN",
    num_classes=80,
    dtype="bfloat16",
    fpn_channels=256,
    num_stages=3,
    with_mask=True,
    with_semantic=False,
    use_extra_attention=False,
    backbone=dict(
        type="ViTAdapter",
        dtype="bfloat16",
        patch_size=16,
        embed_dim=384,
        depth=12,
        num_heads=6,
        drop_path_rate=0.2,
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
