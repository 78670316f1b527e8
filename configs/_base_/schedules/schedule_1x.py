# 1x (12-epoch) detection schedule (counterpart of mmdet
# `_base_/schedules/schedule_1x.py` with the reference AdamW overrides).
optimizer = dict(type="AdamW", lr=1e-4, betas=[0.9, 0.999],
                 weight_decay=0.05, layer_decay_rate=1.0, grad_clip=None)
lr_config = dict(policy="step", warmup_iters=500, steps=[8, 11])
runner = dict(max_epochs=12)
