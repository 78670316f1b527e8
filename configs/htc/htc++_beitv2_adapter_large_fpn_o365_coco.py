# HTC++ + BEiTv2-Adapter-L fine-tuned from the Objects365 pre-trained
# detector, 20k iters. BASELINE: 61.8 box / 53.0 mask AP minival
# (`detection/README.md:145-156`). Counterpart of reference
# `htc++_beitv2_adapter_large_fpn_o365_coco.py` (drop_path 0.4 -> 0.3 for
# fine-tune; whole-detector weights via load_from).
_base_ = [
    "../_base_/models/htc_beit_adapter.py",
    "../_base_/datasets/coco_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(
    backbone=dict(
        drop_path_rate=0.3,
    ),
)
data = dict(samples_per_chip=1, crop_size=[1600, 1400])
optimizer = dict(lr=2e-4, layer_decay_rate=0.9)
runner = dict(_delete_=True, max_iters=20000)
load_from = "pretrained/htc++_beitv2_adapter_large_fpn_o365.pth"
