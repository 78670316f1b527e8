# Flagship: Mask2Former + BEiT-Adapter-L on ADE20K, 896 crop, 80k iters.
# Counterpart of reference `mask2former_beit_adapter_large_896_80k_ade20k_ss.py`
# (num_queries 200, feat 1024, 32 heads, FFN 4096, slide 896/512,
#  LayerDecay lr 2e-5 rate 0.9).
_base_ = [
    "../_base_/models/mask2former_beit.py",
    "../_base_/datasets/ade20k.py",
    "../_base_/schedules/schedule_160k.py",
]

model = dict(
    backbone=dict(img_size=896),
    decode_head=dict(
        num_queries=200,
        feat_channels=1024,
        out_channels=1024,
        num_heads=32,
        decoder_ffn_dim=4096,
        pixel_encoder_ffn_dim=4096,
        pixel_encoder_heads=32,
    ),
)
data = dict(samples_per_chip=1, crop_size=[896, 896], scale=[3584, 896])
optimizer = dict(lr=2e-5, weight_decay=0.05, layer_decay_rate=0.9)
runner = dict(max_iters=80000)
evaluation = dict(interval=8000, metric="mIoU")
test_cfg = dict(mode="slide", crop_size=[896, 896], stride=[512, 512])
pretrained = "pretrained/beit_large_patch16_224_pt22k_ft22k.pth"
