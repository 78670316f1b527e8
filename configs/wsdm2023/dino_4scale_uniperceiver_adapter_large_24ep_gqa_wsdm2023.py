# GroundingDINO + Uni-Perceiver-Adapter-L fine-tuned 24 epochs on WSDM2023
# (from the 6ep GQA pre-trained detector). BASELINE: 76.7 val / 76.9 public
# Acc (`wsdm2023/README.md:86`). Counterpart of reference
# `dino_4scale_uniperceiver_adapter_large_24ep_gqa_wsdm2023.py`.
_base_ = [
    "../_base_/models/dino_uniperceiver_adapter.py",
    "../_base_/datasets/wsdm2023.py",
    "../_base_/schedules/schedule_24ep.py",
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
load_from = "work_dirs/dino_4scale_uniperceiver_adapter_large_6ep_gqa/latest"
pretrained = ("pretrained/uni-perceiver-large-L24-H1024-224size-"
              "pretrained_converted.pth")
