# GroundingDINO + Uni-Perceiver-Adapter-L, 6-epoch GQA grounding
# pre-training. Counterpart of reference
# `wsdm2023/configs/dino_4scale_uniperceiver_adapter_large_6ep_gqa.py`.
_base_ = [
    "../_base_/models/dino_uniperceiver_adapter.py",
    "../_base_/datasets/grounding_gqa.py",
    "../_base_/schedules/schedule_6ep.py",
    "../_base_/default_runtime.py",
]
model = dict(
    backbone=dict(
        embed_dim=1024,
        depth=24,
        num_heads=16,
        drop_path_rate=0.3,
        deform_num_heads=16,
        interaction_indexes=[[0, 5], [6, 11], [12, 17], [18, 23]],
    ),
)
pretrained = ("pretrained/uni-perceiver-large-L24-H1024-224size-"
              "pretrained_converted.pth")
