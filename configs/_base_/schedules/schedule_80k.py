# 80k-iteration AdamW schedule (counterpart of mmseg `schedule_80k.py` with
# the reference LayerDecay optimizer overrides).
optimizer = dict(type="AdamW", lr=2e-5, betas=[0.9, 0.999],
                 weight_decay=0.05, layer_decay_rate=0.9)
lr_config = dict(policy="poly", warmup_iters=1500, warmup_ratio=1e-6,
                 power=1.0, min_lr=0.0)
runner = dict(max_iters=80000)
checkpoint_config = dict(interval=1000, max_keep_ckpts=1)
evaluation = dict(interval=8000, metric="mIoU", save_best="mIoU")
log_config = dict(interval=50)
