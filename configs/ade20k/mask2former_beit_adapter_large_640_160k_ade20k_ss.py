# Mask2Former + BEiT-Adapter-L on ADE20K, 640 crop, 160k iters (single-scale).
# Counterpart of reference `mask2former_beit_adapter_large_640_160k_ade20k_ss.py`
# (100 queries, feat 1024, 32 heads, FFN 4096, slide 640/426).
_base_ = ["../mask2former/mask2former_beit_adapter_large_896_80k_ade20k_ss.py"]
model = dict(
    backbone=dict(img_size=640),
    decode_head=dict(num_queries=100),
)
data = dict(samples_per_chip=1, crop_size=[640, 640], scale=[2048, 640])
runner = dict(max_iters=160000)
test_cfg = dict(mode="slide", crop_size=[640, 640], stride=[426, 426])
