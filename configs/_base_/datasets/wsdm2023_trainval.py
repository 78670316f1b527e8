# WSDM2023 train+val combined split (counterpart of reference
# `wsdm2023/configs/_base_/datasets/wsdm2023_trainval.py` — used for the
# final submission model, evaluated on the public leaderboard).
_base_ = ["./wsdm2023.py"]
data = dict(
    train=dict(ann_file="annotations/trainval.json", img_dir="images"),
    paraphrase_cache="data/wsdm2023/annotations/paraphrase_trainval.json",
)
