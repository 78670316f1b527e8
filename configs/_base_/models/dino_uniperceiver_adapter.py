# GroundingDINO + UniPerceiver-Adapter skeleton (counterpart of the model
# block shared by the reference `wsdm2023/configs/dino_4scale_*.py`: DINO
# head num_query 100, two-stage + box refine, CdnQueryGenerator, aux seg
# branch `with_aux_loss=True`). Variant configs set backbone size /
# drop_path / pretrained.
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
    with_aux_seg=True,
    backbone=dict(
        type="UniPerceiverAdapter",
        patch_size=16,
        embed_dim=768,
        depth=12,
        num_heads=12,
        drop_path_rate=0.2,
        conv_inplane=64,
        n_points=4,
        deform_num_heads=12,
        cffn_ratio=0.25,
        deform_ratio=0.5,
        num_grounding_blocks=0,
        out_indices=[1, 2, 3],
        interaction_indexes=[[0, 2], [3, 5], [6, 8], [9, 11]],
    ),
)
