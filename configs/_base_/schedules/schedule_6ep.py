# 6-epoch grounding pre-training schedule (reference
# `wsdm2023/configs/dino_4scale_uniperceiver_adapter_*_6ep_gqa.py`).
optimizer = dict(type="AdamW", lr=1e-4, weight_decay=0.05,
                 layer_decay_rate=0.8, grad_clip=0.1)
lr_config = dict(policy="step", warmup_iters=500, steps=[5])
runner = dict(max_epochs=6)
