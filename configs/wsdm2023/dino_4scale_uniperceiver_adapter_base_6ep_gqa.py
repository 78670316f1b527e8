# GroundingDINO + Uni-Perceiver-Adapter-B, 6-epoch GQA grounding
# pre-training. Counterpart of reference
# `wsdm2023/configs/dino_4scale_uniperceiver_adapter_base_6ep_gqa.py`.
_base_ = [
    "../_base_/models/dino_uniperceiver_adapter.py",
    "../_base_/datasets/grounding_gqa.py",
    "../_base_/schedules/schedule_6ep.py",
    "../_base_/default_runtime.py",
]
pretrained = ("pretrained/uni-perceiver-base-L12-H768-224size-torch-"
              "pretrained_converted.pth")
