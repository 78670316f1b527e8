# HTC++ + Uni-Perceiver-Adapter-L, 3x. Counterpart of reference
# `htc++_uniperceiver_adapter_large_fpn_3x_coco.py` (window pattern
# [14x5, global] x 4, no activation checkpointing).
_base_ = [
    "../_base_/models/htc_beit_adapter.py",
    "../_base_/datasets/coco_instance.py",
    "../_base_/schedules/schedule_3x.py",
    "../_base_/default_runtime.py",
]
model = dict(
    backbone=dict(
        _delete_=True,
        type="UniPerceiverAdapter",
        patch_size=16,
        embed_dim=1024,
        depth=24,
        num_heads=16,
        drop_path_rate=0.4,
        conv_inplane=64,
        n_points=4,
        deform_num_heads=16,
        cffn_ratio=0.25,
        deform_ratio=0.5,
        out_indices=[0, 1, 2, 3],
        interaction_indexes=[[0, 5], [6, 11], [12, 17], [18, 23]],
        window_attn=([True] * 5 + [False]) * 4,
        window_size=([14] * 5 + [None]) * 4,
    ),
)
data = dict(samples_per_chip=1, crop_size=[1600, 1400])
optimizer = dict(lr=2e-4, layer_decay_rate=0.9)
pretrained = ("pretrained/uni-perceiver-large-L24-H1024-224size-"
              "pretrained_converted.pth")
