# Mask R-CNN + Uni-Perceiver-Adapter-B, 3x+MS. BASELINE: 51.2 box / 45.3
# mask AP (`detection/README.md:179`). Counterpart of reference
# `mask_rcnn_uniperceiver_adapter_base_fpn_3x_coco.py`.
_base_ = [
    "../_base_/models/mask_rcnn_vit_adapter.py",
    "../_base_/datasets/coco_instance.py",
    "../_base_/schedules/schedule_3x.py",
    "../_base_/default_runtime.py",
]
model = dict(
    backbone=dict(
        _delete_=True,
        type="UniPerceiverAdapter",
        dtype="bfloat16",
        patch_size=16,
        embed_dim=768,
        depth=12,
        num_heads=12,
        drop_path_rate=0.3,
        conv_inplane=64,
        n_points=4,
        deform_num_heads=12,
        cffn_ratio=0.25,
        deform_ratio=0.5,
        out_indices=[0, 1, 2, 3],
        interaction_indexes=[[0, 2], [3, 5], [6, 8], [9, 11]],
    ),
)
pretrained = ("pretrained/uni-perceiver-base-L12-H768-224size-torch-"
              "pretrained_converted.pth")
