# Upgraded Mask R-CNN + ViT-Adapter-B (MAE), large-scale-jitter, 25 epochs.
# BASELINE: 50.3 box / 44.7 mask AP (`detection/README.md:191`). Counterpart
# of reference `mask_rcnn_mae_adapter_base_lsj_fpn_25ep_coco.py` (ViTDet-
# style recipe: LSJ 1024, residual bottleneck blocks on the windowed ViT).
_base_ = [
    "../_base_/models/mask_rcnn_vit_adapter.py",
    "../_base_/datasets/coco_instance.py",
    "../_base_/default_runtime.py",
]
model = dict(
    backbone=dict(
        embed_dim=768,
        num_heads=12,
        drop_path_rate=0.2,
        deform_num_heads=12,
        layer_scale=False,
        window_attn=[True, True, False] * 4,
        window_size=[14, 14, None] * 4,
    ),
)
data = dict(
    samples_per_chip=4,
    crop_size=[1024, 1024],
    # LSJ: single-policy resize over the 0.1-2.0 range folded into the
    # static canvas (reference large-scale-jitter pipeline)
    autoaug=False,
    det_scales=[int(1024 * s / 10) for s in range(1, 21)],
    max_long_edge=2048,
)
optimizer = dict(type="AdamW", lr=1e-4, weight_decay=0.1,
                 layer_decay_rate=0.8, grad_clip=None)
lr_config = dict(policy="step", warmup_iters=250, steps=[22, 24])
runner = dict(max_epochs=25)
pretrained = "pretrained/mae_pretrain_vit_base.pth"
