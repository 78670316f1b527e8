"""Training state + jitted train step (data-parallel over a mesh).

Replaces the reference runner stack (mm EpochBased/IterBasedRunner + DDP +
Fp16OptimizerHook): one `jit`-compiled step where the gradient mean over the
sharded batch, SyncBN stats and loss normalizers are all compiler-inserted
collectives. bf16 activations + fp32 params replace the fp16/loss-scale-512
recipe (reference `upernet_deit_adapter_tiny...py:66`).
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vitadapter.models.segmentor import segmentation_loss


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # optional exponential moving average of params (the reference's wsdm
    # training keeps EMA weights; `release.py` strips them at export)
    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    @classmethod
    def create(cls, params, batch_stats, tx, ema_decay: float = 0.0):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params), tx=tx,
                   ema_params=params if ema_decay > 0 else None,
                   ema_decay=ema_decay)

    def update_ema(self):
        if self.ema_params is None:
            return self
        d = self.ema_decay
        ema = jax.tree_util.tree_map(lambda e, p: d * e + (1 - d) * p,
                                     self.ema_params, self.params)
        return self.replace(ema_params=ema)


def make_m2f_train_step(model, num_classes: int, max_instances: int = 60,
                        num_points: int = 12544) -> Callable:
    """Train step for EncoderDecoderMask2Former: per-layer Hungarian-matched
    cls + point-sampled mask/dice losses (reference Mask2FormerHead.loss)."""
    from vitadapter.heads.mask2former_loss import mask2former_loss

    def train_step(state: TrainState, batch, rng):
        r_drop, r_loss = jax.random.split(rng)

        def loss_fn(params):
            (cls_list, mask_list), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], train=True, mutable=["batch_stats"],
                rngs={"dropout": r_drop})
            loss, logs = mask2former_loss(
                r_loss, cls_list, mask_list, batch["label"],
                num_classes=num_classes, max_instances=max_instances,
                num_points=num_points)
            return loss, (logs, updates["batch_stats"])

        (loss, (logs, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(step=state.step + 1, params=params,
                              batch_stats=new_stats, opt_state=opt_state)
        state = state.update_ema()
        logs = {k: v for k, v in logs.items() if not k.startswith("d")}
        logs = dict(logs, loss=loss, grad_norm=optax.global_norm(grads))
        return state, logs

    return train_step


def make_seg_train_step(model, aux_weight: float = 0.4,
                        ignore_index: int = 255) -> Callable:
    """Returns jittable train_step(state, batch, rng) -> (state, logs).

    batch: {"image": (B,H,W,3) float, "label": (B,H,W) int32}
    """

    def train_step(state: TrainState, batch, rng):
        def loss_fn(params):
            (logits, aux), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], train=True, with_aux=True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            loss, logs = segmentation_loss(logits, aux, batch["label"],
                                           aux_weight, ignore_index)
            return loss, (logs, updates["batch_stats"])

        (loss, (logs, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(step=state.step + 1, params=params,
                              batch_stats=new_stats, opt_state=opt_state)
        state = state.update_ema()
        logs = dict(logs, loss=loss,
                    grad_norm=optax.global_norm(grads))
        return state, logs

    return train_step
