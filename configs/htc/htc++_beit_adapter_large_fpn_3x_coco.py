# HTC++ + BEiT-Adapter-L on COCO, 3x. BASELINE: 58.4 box / 50.8 mask AP
# minival (`detection/README.md:81-94`; pinned eval printout `:202-232`).
# Counterpart of reference `htc++_beit_adapter_large_fpn_3x_coco.py`
# (window pattern [14x5, 56] x 4, ExtraAttention on the coarsest level).
_base_ = [
    "../_base_/models/htc_beit_adapter.py",
    "../_base_/datasets/coco_instance.py",
    "../_base_/schedules/schedule_3x.py",
    "../_base_/default_runtime.py",
]
data = dict(samples_per_chip=1, crop_size=[1600, 1400])
optimizer = dict(lr=2e-4, layer_decay_rate=0.9)
pretrained = "pretrained/beit_large_patch16_224_pt22k_ft22k.pth"
