#!/usr/bin/env python
"""Component profile of the flagship Mask2Former train step (VERDICT r2 #4).

Times the full batch-2 train step and ablations that isolate the big
suspects: the all-layer Hungarian assignment (cost sampling + auction), the
uncertainty point-sampled losses, the MSDA backward, and the optimizer.

Usage: python tools/profile_train.py [--batch 2] [--size 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from vitadapter.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
import numpy as np


def timed(fn, args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    # scalar-fetch sync (block_until_ready does not sync through the axon
    # tunnel): reduce to a scalar and pull it
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    s = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    assert np.isfinite(s)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--num-points", type=int, default=12544)
    args = ap.parse_args()

    from vitadapter.heads import mask2former_loss as ml
    from vitadapter.train.optim import make_optimizer
    from vitadapter.train.trainer import TrainState, make_m2f_train_step
    from vitadapter.zoo import mask2former_vit_adapter

    B, S = args.batch, args.size
    model = mask2former_vit_adapter("large", num_classes=150,
                                    dtype=jnp.bfloat16)
    img = jnp.zeros((B, S, S, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), img)
    tx, _ = make_optimizer(variables["params"], total_steps=1000,
                           warmup_steps=10, grad_clip=0.01)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    batch = {
        "image": jnp.asarray(
            np.random.RandomState(0).randn(B, S, S, 3), jnp.float32),
        "label": jnp.asarray(np.random.RandomState(1).randint(
            0, 150, (B, S, S)), jnp.int32),
    }
    rng = jax.random.PRNGKey(2)

    # --- full step (donated state, threaded like the real loop: without
    # donation two full optimizer states are alive at once -> HBM OOM) ---
    step = jax.jit(make_m2f_train_step(model, num_classes=150,
                                       max_instances=60,
                                       num_points=args.num_points),
                   donate_argnums=(0,))
    state, m = step(state, batch, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        state, m = step(state, batch, rng)
    assert np.isfinite(float(m["loss"]))
    ms_full = (time.perf_counter() - t0) / n * 1e3
    print(f"full train step          {ms_full:8.1f} ms/batch{B}")

    # --- model forward only (train mode, no loss/grad) ---
    # (a combined fwd+loss-no-grad ablation measured slower than the FULL
    # step: without the backward, XLA keeps all 10 layers' full-res mask
    # logits alive for the loss instead of rematerializing, and the graph
    # spills — so the forward is measured alone and the loss share comes
    # from the stop-gradient ablations below)
    def fwd_only(params, b, r):
        cls_list, mask_list = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            b["image"], train=True, mutable=False, rngs={"dropout": r},
            method=lambda m, x, train: m.decode_head(m.backbone(x),
                                                     train=train))
        return (cls_list[-1].astype(jnp.float32).mean()
                + mask_list[-1].astype(jnp.float32).mean())

    try:
        jl = jax.jit(fwd_only)
        ms_fwd = timed(jl, (state.params, batch, rng))
        print(f"model fwd (train mode)   {ms_fwd:8.1f} ms")
    except Exception as e:
        print(f"model fwd ERR {str(e)[:200]}")
        ms_fwd = None

    # --- head outputs once, then loss-only ablations ---
    cls_list, mask_list = jax.jit(
        lambda p, x, r: model.apply(
            {"params": p, "batch_stats": state.batch_stats}, x, train=True,
            mutable=False, rngs={"dropout": r},
            method=lambda m, xx, train: m.decode_head(m.backbone(xx),
                                                      train=train)))(
        state.params, batch["image"], rng)
    # Pass the head outputs as explicit jit ARGUMENTS: closure-captured
    # device arrays become jaxpr constants, and the axon tunnel re-ships
    # constant buffers on every execution (measured: the 10-layer stacked
    # mask logits turned a ~300 ms loss graph into a 100+ s one).
    cls_stack = jnp.stack(cls_list)
    mask_stack = jnp.stack(mask_list)
    L = cls_stack.shape[0]

    def loss_only(cs, ms, lbl, r):
        total, _ = ml.mask2former_loss(
            r, [cs[i] for i in range(L)], [ms[i] for i in range(L)],
            lbl, num_classes=150,
            max_instances=60, num_points=args.num_points)
        return total

    ms_loss = timed(jax.jit(loss_only),
                    (cls_stack, mask_stack, batch["label"], rng))
    print(f"loss only (all layers)   {ms_loss:8.1f} ms")

    def assign_only(cs, ms, lbl, r):
        gt_labels, gt_valid = ml.present_classes(lbl, 150, 60)
        out = ml._assign_all_layers(
            r, cs, ms, lbl,
            gt_labels, gt_valid, num_points=args.num_points,
            cost_cls=2.0, cost_mask=5.0, cost_dice=5.0)
        return out.astype(jnp.float32)

    ms_assign = timed(jax.jit(assign_only),
                      (cls_stack, mask_stack, batch["label"], rng))
    print(f"assignment (cost+LAP)    {ms_assign:8.1f} ms")

    if ms_fwd is not None:
        print(f"=> loss+bwd+optimizer    {ms_full - ms_fwd:8.1f} ms")
    print(f"=> per-layer losses      {ms_loss - ms_assign:8.1f} ms")


if __name__ == "__main__":
    main()
