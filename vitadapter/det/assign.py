"""Target assignment and sampling with static shapes.

Parity targets: mmdet `MaxIoUAssigner` (pos/neg IoU thresholds +
low-quality gt rescue) and `RandomSampler` (fixed budget, pos_fraction).
Dynamic per-image positive counts become fixed budgets + validity masks
(SURVEY §7 hard part 3).
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vitadapter.det.boxes import bbox_overlaps

NEG = -1
IGNORE = -2


def max_iou_assign(
    boxes: jax.Array,        # (N, 4) anchors / proposals
    gt_boxes: jax.Array,     # (G, 4)
    gt_valid: jax.Array,     # (G,)
    pos_iou_thr: float = 0.7,
    neg_iou_thr: float = 0.3,
    min_pos_iou: float = 0.3,
    match_low_quality: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (assigned (N,) int32: gt idx / NEG / IGNORE, max_iou (N,))."""
    iou = bbox_overlaps(boxes, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1).astype(jnp.int32)
    max_iou = jnp.max(iou, axis=1)

    assigned = jnp.full(boxes.shape[:1], IGNORE, jnp.int32)
    assigned = jnp.where(max_iou < neg_iou_thr, NEG, assigned)
    assigned = jnp.where(max_iou >= pos_iou_thr, best_gt, assigned)

    if match_low_quality:
        # each gt claims its best anchor(s) if IoU >= min_pos_iou
        gt_best_iou = jnp.max(iou, axis=0)  # (G,)
        is_best = (iou == gt_best_iou[None, :]) & gt_valid[None, :] & \
                  (iou >= min_pos_iou)
        # mmdet assigns gts in index order; later gts overwrite earlier ones
        any_best = is_best.any(axis=1)
        claim = jnp.where(
            any_best,
            (is_best.shape[1] - 1
             - jnp.argmax(is_best[:, ::-1], axis=1)).astype(jnp.int32),
            assigned)
        assigned = claim
    return assigned, max_iou


class SampleResult(NamedTuple):
    idx: jax.Array        # (num,) sampled box indices
    is_pos: jax.Array     # (num,) bool
    is_valid: jax.Array   # (num,) bool (false = padding slot)
    gt_idx: jax.Array     # (num,) assigned gt for positives (0 otherwise)


def random_sample(rng: jax.Array, assigned: jax.Array, num: int,
                  pos_fraction: float = 0.5,
                  neg_pos_ub: Optional[float] = None) -> SampleResult:
    """Sample `num` boxes: up to num*pos_fraction positives, rest negatives.

    Uniform random without replacement via random-priority top-k.
    """
    N = assigned.shape[0]
    is_pos = assigned >= 0
    is_neg = assigned == NEG
    r = jax.random.uniform(rng, (N,))
    num_pos_budget = int(num * pos_fraction)

    pos_priority = jnp.where(is_pos, r, -jnp.inf)
    _, pos_idx = jax.lax.top_k(pos_priority, num_pos_budget)
    pos_ok = jnp.take(is_pos, pos_idx)
    n_pos = pos_ok.sum()

    neg_priority = jnp.where(is_neg, r, -jnp.inf)
    _, neg_idx = jax.lax.top_k(neg_priority, num)
    neg_ok = jnp.take(is_neg, neg_idx)
    # take exactly num - n_pos negatives
    neg_rank = jnp.cumsum(neg_ok) - 1
    neg_take = neg_ok & (neg_rank < num - n_pos)

    # pack: positives first, then negatives
    idx = jnp.concatenate([pos_idx, neg_idx])
    keep = jnp.concatenate([pos_ok, neg_take])
    pos_flag = jnp.concatenate([pos_ok, jnp.zeros_like(neg_take)])
    rank = jnp.cumsum(keep) - 1
    out_idx = jnp.zeros((num,), jnp.int32)
    out_pos = jnp.zeros((num,), bool)
    out_valid = jnp.zeros((num,), bool)
    out_idx = out_idx.at[jnp.where(keep, rank, num)].set(
        idx.astype(jnp.int32), mode="drop")
    out_pos = out_pos.at[jnp.where(keep, rank, num)].set(pos_flag, mode="drop")
    out_valid = out_valid.at[jnp.where(keep, rank, num)].set(keep, mode="drop")
    gt_idx = jnp.maximum(jnp.take(assigned, out_idx), 0)
    return SampleResult(out_idx, out_pos, out_valid, gt_idx)
