# UperNet + ViT-Adapter-T on ADE20K 512x512, 160k iters.
# Counterpart of reference `upernet_deit_adapter_tiny_512_160k_ade20k.py`
# (DeiT-T trunk: embed 192, heads 3, drop_path 0.1, no layer scale,
#  global attention at every depth; slide eval 512 crop / 341 stride).
_base_ = [
    "../_base_/models/upernet_vit_adapter.py",
    "../_base_/datasets/ade20k.py",
    "../_base_/schedules/schedule_160k.py",
]

pretrained = "pretrained/deit_tiny_patch16_224-a1311bcf.pth"
test_cfg = dict(mode="slide", crop_size=[512, 512], stride=[341, 341])
