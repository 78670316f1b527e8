# WSDM Cup 2023 Toloka VQA grounding dataset (counterpart of reference
# `wsdm2023/configs/_base_/datasets/wsdm2023.py`: LoadRefer(question) ->
# RandomParaPhrase(cache) -> Resize(1333, 800) -> RandomFlipWithRefer ->
# TokenizeRefer(max_sent_len=128)).
data = dict(
    dataset_type="WSDMCocoDataset",
    data_root="data/wsdm2023",
    train=dict(ann_file="annotations/train.json", img_dir="images"),
    val=dict(ann_file="annotations/val.json", img_dir="images"),
    samples_per_chip=2,
    crop_size=[1024, 1024],
    max_instances=1,
    max_sent_len=128,
    paraphrase_cache="data/wsdm2023/annotations/paraphrase_train.json",
    workers=4,
)
evaluation = dict(metric=["IoU", "Acc"])
