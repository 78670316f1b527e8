# GroundingDINO + UniPerceiver-Adapter-L for WSDM2023 grounding.
# Counterpart of reference
# `dino_4scale_uniperceiver_adapter_large_24ep_gqa_wsdm2023.py`
# (DINO head num_query 100, CdnQueryGenerator).
model = dict(
    type="GroundingDINO",
    num_classes=1,
    num_queries=100,
    embed_dim=256,
    num_heads=8,
    ffn_dim=2048,
    num_encoder_layers=6,
    num_decoder_layers=6,
    dn_groups=2,
    backbone=dict(
        type="UniPerceiverAdapter",
        patch_size=16, embed_dim=1024, depth=24, num_heads=16,
        drop_path_rate=0.4, conv_inplane=64, deform_num_heads=16,
        cffn_ratio=0.25, deform_ratio=0.5,
        interaction_indexes=[[0, 5], [6, 11], [12, 17], [18, 23]],
        num_grounding_blocks=3,
        out_indices=[0, 1, 2, 3]),
)
data = dict(dataset_type="WSDMCocoDataset", data_root="data/wsdm2023",
            train=dict(ann_file="train.json", img_dir="train"),
            val=dict(ann_file="val.json", img_dir="val"),
            samples_per_chip=1, crop_size=[1024, 1024], max_instances=1,
            max_sent_len=128)
optimizer = dict(type="AdamW", lr=1e-4, weight_decay=1e-4, layer_decay_rate=0.9)
runner = dict(max_epochs=24)
pretrained = "pretrained/uni-perceiver-large-L24-H1024-224size-pretrained_converted.pth"
