"""LR schedules vs the reference formulas.

poly: mmcv poly policy (linear warmup + (1-t/T)^power);
cosine: `cosine_scheduler` (reference `segmentation/mmcv_custom/
checkpoint.py:290-314`).
"""

import math

import numpy as np

from vitadapter.train.optim import (cosine_schedule_with_warmup,
                                    poly_schedule_with_warmup)


def test_cosine_matches_reference_formula():
    base, total, warm = 1e-3, 100, 10
    s = cosine_schedule_with_warmup(base, total, warmup_steps=warm)
    for step in (0, 3, 9, 10, 40, 77, 99, 100):
        ours = float(s(step))
        if step < warm:
            ref = base * step / warm
        else:
            i = step - warm
            ref = 0.5 * base * (1 + math.cos(math.pi * i / (total - warm)))
        assert abs(ours - ref) < 1e-9, (step, ours, ref)


def test_poly_warmup_and_decay_endpoints():
    base, total, warm = 2e-4, 1000, 100
    s = poly_schedule_with_warmup(base, total, warmup_steps=warm)
    assert float(s(0)) < 1e-8
    assert abs(float(s(warm)) - base) < 1e-9
    assert float(s(total)) < 1e-9
    mid = float(s((total + warm) // 2))
    assert 0 < mid < base


def test_make_optimizer_cosine_policy():
    import jax.numpy as jnp

    from vitadapter.train.optim import make_optimizer

    params = {"blocks_0": {"w": jnp.ones((4, 4))},
              "head": {"b": jnp.zeros((4,))}}
    tx, schedule = make_optimizer(params, base_lr=1e-3, total_steps=50,
                                  warmup_steps=5, lr_policy="cosine")
    lrs = np.asarray([float(schedule(i)) for i in range(51)])
    # cosine: monotone decay after warmup, half value at midpoint
    assert lrs[5] == max(lrs)
    assert (np.diff(lrs[5:]) <= 1e-12).all()
    assert abs(lrs[5 + 22] - 0.5e-3) < 1e-4
