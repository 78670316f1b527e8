# Mask2Former + BEiT-Adapter-L for CHASE DB1 (binary vessel, 128 crops;
# 256-dim small-head recipe) — counterpart of reference
# `_base_/models/mask2former_beit_chase_db1.py` as overridden by
# `chase_db1/mask2former_beit_adapter_large_128_40k_chase_db1_ss.py:38-99`.
_base_ = ["./mask2former_beit.py"]
model = dict(
    backbone=dict(img_size=128),
    decode_head=dict(num_classes=2, num_queries=100),
)
