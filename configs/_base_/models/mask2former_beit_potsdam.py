# Mask2Former + BEiT-Adapter-L for Potsdam (6 classes; the 256-dim / 8-head
# / FFN-2048 small-head recipe) — counterpart of reference
# `_base_/models/mask2former_beit_potsdam.py` as overridden by
# `potsdam/mask2former_beit_adapter_large_512_80k_potsdam_ss.py:53-99`.
_base_ = ["./mask2former_beit.py"]
model = dict(
    backbone=dict(img_size=512),
    decode_head=dict(num_classes=6, num_queries=100),
)
