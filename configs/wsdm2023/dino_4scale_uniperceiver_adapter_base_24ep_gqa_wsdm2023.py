# GroundingDINO + Uni-Perceiver-Adapter-B fine-tuned 24 epochs on WSDM2023
# (from the 6ep GQA pre-trained detector). BASELINE: 74.2 val / 74.2 public
# Acc (`wsdm2023/README.md:85`). Counterpart of reference
# `dino_4scale_uniperceiver_adapter_base_24ep_gqa_wsdm2023.py`.
_base_ = [
    "../_base_/models/dino_uniperceiver_adapter.py",
    "../_base_/datasets/wsdm2023.py",
    "../_base_/schedules/schedule_24ep.py",
    "../_base_/default_runtime.py",
]
load_from = "work_dirs/dino_4scale_uniperceiver_adapter_base_6ep_gqa/latest"
pretrained = ("pretrained/uni-perceiver-base-L12-H768-224size-torch-"
              "pretrained_converted.pth")
