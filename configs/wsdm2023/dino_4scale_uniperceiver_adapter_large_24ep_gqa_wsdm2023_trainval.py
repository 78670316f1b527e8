# The WSDM2023 submission model: Uni-Perceiver-Adapter-L fine-tuned on
# train+val with the trainval paraphrase cache; evaluated with the TTA vote.
# BASELINE: 77.5 public / 76.347 private Acc (`wsdm2023/README.md:87`).
# Counterpart of reference
# `dino_4scale_uniperceiver_adapter_large_24ep_gqa_wsdm2023_trainval.py`.
_base_ = ["./dino_4scale_uniperceiver_adapter_large_24ep_gqa_wsdm2023.py"]
data = dict(
    _delete_=False,
    train=dict(ann_file="annotations/trainval.json", img_dir="images"),
    paraphrase_cache="data/wsdm2023/annotations/paraphrase_trainval.json",
)
# reference test pipeline MultiScaleFlipAug scale set + flip
# (`dino_4scale_uniperceiver_adapter_*_wsdm2023.py:188`)
tta = dict(scales=[[1333, 600], [1333, 800], [1333, 1000]], flip=True)
