# Upgraded Mask R-CNN + ViT-Adapter-B (MAE), LSJ, 50 epochs. BASELINE: 50.8
# box / 45.1 mask AP (`detection/README.md:192`). Counterpart of reference
# `mask_rcnn_mae_adapter_base_lsj_fpn_50ep_coco.py`.
_base_ = ["./mask_rcnn_mae_adapter_base_lsj_fpn_25ep_coco.py"]
lr_config = dict(policy="step", warmup_iters=250, steps=[44, 48])
runner = dict(max_epochs=50)
