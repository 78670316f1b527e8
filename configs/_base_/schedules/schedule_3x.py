# 3x (36-epoch) detection schedule (counterpart of mmdet
# `_base_/schedules/schedule_3x.py`; steps at epoch 27/33).
optimizer = dict(type="AdamW", lr=1e-4, betas=[0.9, 0.999],
                 weight_decay=0.05, layer_decay_rate=1.0, grad_clip=None)
lr_config = dict(policy="step", warmup_iters=500, steps=[27, 33])
runner = dict(max_epochs=36)
