# MaskFormer + BEiT-Adapter base (counterpart of reference
# `_base_/models/maskformer_beit.py` — the per-pixel + mask-classification
# predecessor of Mask2Former, plain-FPN pixel decoder).
_base_ = ["./mask2former_beit.py"]
model = dict(
    decode_head=dict(
        _delete_=True,
        type="MaskFormerHead",
        num_classes=150,
        num_queries=100,
        feat_channels=256,
        out_channels=256,
        num_decoder_layers=6,
        num_heads=8,
        decoder_ffn_dim=2048,
    ),
)
