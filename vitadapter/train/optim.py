"""Optimizer construction: AdamW with layer-wise LR decay.

Parity target: `LayerDecayOptimizerConstructor`
(reference `detection/mmcv_custom/layer_decay_optimizer_constructor.py:17-102`):
  * layer id 0 for pos_embed / cls_token / patch_embed, `blocks.i` -> i+1,
    everything else (adapter, heads) -> num_layers - 1
  * per-group lr scale = rate ** (num_layers - id - 1), num_layers = depth + 2
  * no weight decay for 1-D params / biases / pos_embed
Plus the poly LR schedule with linear warmup
(`upernet_deit_adapter_tiny_512_160k_ade20k.py` lr_config).
"""

import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def vit_layer_id(path: str, num_layers: int) -> int:
    """Map a parameter path to its layer-decay id (reference
    `get_num_layer_for_vit`, layer_decay_optimizer_constructor.py:17-30)."""
    if "pos_embed" in path or "cls_token" in path or "patch_embed" in path:
        return 0
    m = re.search(r"blocks_(\d+)", path)
    if m:
        return int(m.group(1)) + 1
    return num_layers - 1


def _paths(params) -> Any:
    flat = jax.tree_util.tree_map_with_path(
        lambda p, v: jax.tree_util.keystr(p), params)
    return flat


def layer_decay_scales(params, depth: int, decay_rate: float):
    """Per-leaf multiplicative lr scale tree."""
    num_layers = depth + 2
    return jax.tree_util.tree_map_with_path(
        lambda p, v: decay_rate ** (
            num_layers - vit_layer_id(jax.tree_util.keystr(p), num_layers) - 1),
        params)


def weight_decay_mask(params):
    """True where weight decay applies (reference: skip 1-D params & biases)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, v: (v.ndim > 1 and "pos_embed" not in jax.tree_util.keystr(p)
                      and "cls_token" not in jax.tree_util.keystr(p)),
        params)


def scale_by_layer_decay(params, depth: int, decay_rate: float):
    scales = layer_decay_scales(params, depth, decay_rate)

    def update_fn(updates, state, params=None):
        return jax.tree_util.tree_map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)


def poly_schedule_with_warmup(base_lr: float, total_steps: int,
                              warmup_steps: int = 1500,
                              warmup_ratio: float = 1e-6,
                              power: float = 1.0, min_lr: float = 0.0):
    """mmcv poly policy: linear warmup then (1 - t/T)^power decay."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (warmup_ratio + (1 - warmup_ratio)
                          * jnp.minimum(step, warmup_steps) / max(warmup_steps, 1))
        t = jnp.clip((step - warmup_steps) / max(total_steps - warmup_steps, 1),
                     0.0, 1.0)
        decayed = (base_lr - min_lr) * (1 - t) ** power + min_lr
        return jnp.where(step < warmup_steps, warm, decayed)

    return schedule


def cosine_schedule_with_warmup(base_lr: float, total_steps: int,
                                warmup_steps: int = 0,
                                final_lr: float = 0.0,
                                start_warmup_lr: float = 0.0):
    """Half-cosine decay with linear warmup (reference `cosine_scheduler`,
    `segmentation/mmcv_custom/checkpoint.py:290-314`; epochs x niter_per_ep
    folded into `total_steps`)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = start_warmup_lr + (base_lr - start_warmup_lr) * (
            jnp.minimum(step, warmup_steps) / max(warmup_steps, 1))
        t = jnp.clip((step - warmup_steps)
                     / max(total_steps - warmup_steps, 1), 0.0, 1.0)
        cos = final_lr + 0.5 * (base_lr - final_lr) * (1 + jnp.cos(
            jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def make_optimizer(
    params,
    base_lr: float = 12e-5,
    weight_decay: float = 0.01,
    depth: int = 12,
    layer_decay_rate: float = 0.95,
    total_steps: int = 160_000,
    warmup_steps: int = 1500,
    grad_clip: Optional[float] = None,
    b1: float = 0.9,
    b2: float = 0.999,
    lr_policy: str = "poly",
):
    """AdamW + layer decay + poly/cosine schedule (reference optimizer
    config; `lr_config.policy` selects the schedule)."""
    if lr_policy == "cosine":
        schedule = cosine_schedule_with_warmup(base_lr, total_steps,
                                               warmup_steps)
    else:
        schedule = poly_schedule_with_warmup(base_lr, total_steps,
                                             warmup_steps)
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain += [
        optax.scale_by_adam(b1=b1, b2=b2),
        optax.add_decayed_weights(weight_decay, mask=weight_decay_mask(params)),
        scale_by_layer_decay(params, depth, layer_decay_rate),
        optax.scale_by_learning_rate(schedule),
    ]
    return optax.chain(*chain), schedule
