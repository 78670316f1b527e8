"""Mask2Former training loss: Hungarian-matched cls + point-sampled mask/dice.

Parity targets (reference `segmentation/mmseg_custom/models/decode_heads/
mask2former_head.py`):
  * `get_targets` (:154) — per-image Hungarian assignment on costs computed at
    `num_points` uniformly sampled mask points (cls 2.0 / BCE 5.0 / dice 5.0,
    config `_base_/models/mask2former_beit.py` train_cfg)
  * `loss_single` (:269) — CE with background weight 0.1 and
    avg_factor = sum(class_weight[label]); mask BCE + naive dice on
    12544 uncertainty-sampled points, normalized by the replica-mean number
    of matched masks (`reduce_mean`)
  * `ToMask` (reference `datasets/pipelines/formatting.py:53`) is re-designed
    TPU-first: instead of materializing (G, H, W) binary masks, gt indicator
    values are bilinearly sampled straight from the integer label map via
    one-hot corner interpolation — same numerics, none of the memory.

Static-shape discipline: gt classes are padded to `max_instances` with a
validity mask; the LAP solve is a host callback (see `ops/matching.py`).
"""

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from vitadapter.ops.matching import (
    bce_mask_cost,
    classification_cost,
    dice_cost,
    hungarian_assign,
)
from vitadapter.ops.point_sample import (
    get_uncertain_point_coords,
    point_sample,
)
from vitadapter.ops.point_sample_pallas import sort_points_by_y


def present_classes(label_map: jax.Array, num_classes: int,
                    max_instances: int) -> Tuple[jax.Array, jax.Array]:
    """ToMask equivalent: per-image present class ids, padded.

    label_map: (B, H, W) int32 with 255 = ignore.
    Returns (labels (B, G) int32, valid (B, G) bool), G = max_instances.
    """
    B = label_map.shape[0]
    onehot = jax.nn.one_hot(label_map.reshape(B, -1), num_classes,
                            dtype=jnp.int32)
    count = onehot.sum(axis=1)  # (B, K)
    present = count > 0
    # stable ordering: ascending class id (matches torch.unique in ToMask)
    order = jnp.argsort(~present, axis=-1, stable=True)
    labels = order[:, :max_instances].astype(jnp.int32)
    valid = jnp.take_along_axis(present, order, axis=-1)[:, :max_instances]
    return labels, valid


def sample_gt_points(label_map: jax.Array, points: jax.Array,
                     gt_labels: jax.Array) -> jax.Array:
    """Bilinear gt-indicator values at normalized points, per gt class.

    label_map: (B, H, W) int; points: (B, P, 2); gt_labels: (B, G)
    returns (B, G, P) float in [0, 1] — identical to bilinear sampling of the
    per-class binary mask (grid_sample align_corners=False, zeros padding).
    Indicator maps + `point_sample` (Pallas on TPU) instead of label-map
    gathers — see `_sample_gt_per_query`.
    """
    B, H, W = label_map.shape
    G = gt_labels.shape[1]
    P = points.shape[1]
    ind = (label_map[:, None] == gt_labels[:, :, None, None]).astype(
        jnp.bfloat16)                                     # (B, G, H, W)
    pts = jnp.broadcast_to(points[:, None], (B, G, P, 2))
    out = point_sample(ind.reshape(B * G, H, W), pts.reshape(B * G, P, 2))
    return out.reshape(B, G, P).astype(jnp.float32)


def _assign_layer(rng, cls_pred, mask_pred, label_map, gt_labels, gt_valid,
                  num_points: int, cost_cls: float, cost_mask: float,
                  cost_dice: float):
    """Hungarian assignment for one decoder layer. Returns (B, Q) gt index
    or -1 (single-layer wrapper over `_assign_all_layers`)."""
    return _assign_all_layers(
        rng, cls_pred[None], mask_pred[None], label_map, gt_labels,
        gt_valid, num_points, cost_cls, cost_mask, cost_dice)[0]


def _assign_all_layers(rng, cls_all, mask_all, label_map, gt_labels,
                       gt_valid, num_points: int, cost_cls: float,
                       cost_mask: float, cost_dice: float):
    """Hungarian assignments for ALL decoder layers in one device pass.

    cls_all (L, B, Q, K+1), mask_all (L, B, Q, h, w) -> (L, B, Q) gt index
    or -1. The layer assignments are independent, so their cost matrices
    batch into a single `hungarian_assign` call — the device auction is a
    latency-bound while_loop, and L sequential calls cost ~L x one batched
    call. Gt indicator maps are built once and sampled at all L layers'
    point sets through one kernel launch (points tile along the P axis).
    """
    L, B, Q = cls_all.shape[:3]
    G = gt_labels.shape[1]
    h, w = mask_all.shape[3:]
    P = num_points
    # row-sorted points: every cost below reduces over P, so the order is
    # free — sorted points give the banded sampling kernel narrow bands
    coords = sort_points_by_y(jax.random.uniform(rng, (L, B, P, 2)))
    # every query's mask sampled at its image's shared points
    # (flattened — point_sample's Pallas path can't be vmapped)
    c_bq = jnp.broadcast_to(coords[:, :, None],
                            (L, B, Q, P, 2)).reshape(L * B * Q, P, 2)
    # bf16 sampling: cost-only (stop-gradient below), and fp32 masks would
    # hit the HIGHEST-precision MXU path (see `_sample_per_query`)
    pred_pts = point_sample(
        mask_all.astype(jnp.bfloat16).reshape(L * B * Q, h, w),
        c_bq).reshape(L, B, Q, P)
    # per-class gt indicators once; all layers' coords ride the P axis
    Hf, Wf = label_map.shape[1:]
    ind = (label_map[:, None] == gt_labels[:, :, None, None]).astype(
        jnp.bfloat16)                                     # (B, G, Hf, Wf)
    c_lp = jnp.moveaxis(coords, 0, 1).reshape(B, L * P, 2)
    c_bg = jnp.broadcast_to(c_lp[:, None], (B, G, L * P, 2))
    gt_pts = point_sample(ind.reshape(B * G, Hf, Wf),
                          c_bg.reshape(B * G, L * P, 2))
    gt_pts = gt_pts.reshape(B, G, L, P).astype(jnp.float32)
    gt_pts = jnp.moveaxis(gt_pts, 2, 0)                   # (L, B, G, P)

    def per_image(cls_p, pr, gt, labels, valid):
        c = classification_cost(cls_p, labels, cost_cls)
        c += bce_mask_cost(pr, gt, cost_mask)
        c += dice_cost(pr, gt, cost_dice)
        return c

    cost = jax.vmap(per_image)(
        cls_all.reshape(L * B, Q, -1), pred_pts.reshape(L * B, Q, P),
        gt_pts.reshape(L * B, G, P),
        jnp.tile(gt_labels, (L, 1)), jnp.tile(gt_valid, (L, 1)))
    cost = jax.lax.stop_gradient(cost)
    n_valid = jnp.tile(gt_valid.sum(axis=-1).astype(jnp.int32), L)
    return hungarian_assign(cost, n_valid).reshape(L, B, Q)


def loss_single_layer(
    rng: jax.Array,
    cls_pred: jax.Array,      # (B, Q, K+1)
    mask_pred: jax.Array,     # (B, Q, h, w) logits
    label_map: jax.Array,     # (B, H, W) int, 255 ignore
    gt_labels: jax.Array,     # (B, G)
    gt_valid: jax.Array,      # (B, G)
    num_classes: int,
    num_points: int = 12544,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
    bg_weight: float = 0.1,
    loss_cls_weight: float = 2.0,
    loss_mask_weight: float = 5.0,
    loss_dice_weight: float = 5.0,
    assign: Optional[jax.Array] = None,   # precomputed (B, Q) assignment
) -> Dict[str, jax.Array]:
    B, Q = cls_pred.shape[:2]
    r_assign, r_pts = jax.random.split(rng)
    if assign is None:
        assign = _assign_layer(
            r_assign, cls_pred, mask_pred, label_map, gt_labels, gt_valid,
            num_points, loss_cls_weight, loss_mask_weight, loss_dice_weight)
    pos = assign >= 0  # (B, Q)
    safe_idx = jnp.maximum(assign, 0)
    labels = jnp.where(
        pos, jnp.take_along_axis(gt_labels, safe_idx, axis=1), num_classes)

    # --- classification CE with background down-weight ---
    class_weight = jnp.concatenate(
        [jnp.ones(num_classes), jnp.asarray([bg_weight])]).astype(jnp.float32)
    logp = jax.nn.log_softmax(cls_pred.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = class_weight[labels]
    avg_factor = jnp.maximum(w.sum(), 1.0)
    loss_cls = (nll * w).sum() / avg_factor * loss_cls_weight

    # --- mask losses on matched queries ---
    num_total_masks = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
    # uncertainty-sampled points per query (no grad through selection)
    # bf16 oversample sampling: selection-only (coords are detached), and
    # the 3x-oversampled pool is the largest sampling call of the loss
    coords = get_uncertain_point_coords(
        r_pts,
        jax.lax.stop_gradient(mask_pred).astype(jnp.bfloat16).reshape(
            B * Q, *mask_pred.shape[2:]),
        num_points, oversample_ratio, importance_sample_ratio)
    # mask/dice reduce over points -> order free; sorted rows make the
    # banded sampling kernel cheap at the full label resolution
    coords = sort_points_by_y(coords.reshape(B, Q, num_points, 2))
    pred_pts = _sample_per_query(mask_pred, coords)
    # gt indicator at the same points, for the assigned class of each query
    q_labels = jnp.where(pos, labels, num_classes + 1)  # never matches ignore
    gt_pts = _sample_gt_per_query(label_map, coords, q_labels)

    pred_f = pred_pts.astype(jnp.float32)
    gt_f = gt_pts.astype(jnp.float32)
    # naive dice (reference DiceLoss naive_dice=True, eps=1)
    pred_sig = jax.nn.sigmoid(pred_f)
    numer = 2 * pred_sig * gt_f
    dice = 1 - (numer.sum(-1) + 1.0) / (pred_sig.sum(-1) + gt_f.sum(-1) + 1.0)
    loss_dice = jnp.where(pos, dice, 0.0).sum() / num_total_masks * loss_dice_weight
    # point BCE, avg over (num_total_masks * num_points)
    bce = jax.nn.softplus(pred_f) - pred_f * gt_f  # BCE-with-logits
    bce = jnp.where(pos[..., None], bce, 0.0).sum()
    loss_mask = bce / (num_total_masks * num_points) * loss_mask_weight

    return {"loss_cls": loss_cls, "loss_mask": loss_mask,
            "loss_dice": loss_dice}


def _sample_per_query(mask_pred: jax.Array, coords: jax.Array) -> jax.Array:
    """mask_pred (B, Q, h, w), coords (B, Q, P, 2) -> (B, Q, P).

    Sampling runs in bf16: fp32 masks put the Pallas contraction on the
    HIGHEST-precision (multi-pass) MXU path, ~6x the bf16 MAC cost — at
    loss scale that dominated the train step. The kernel accumulates in
    fp32 either way; bf16 interpolation weights round at 2^-8, immaterial
    for point losses (the reference trains this head in fp16 AMP)."""
    B, Q, h, w = mask_pred.shape
    P = coords.shape[2]
    flat = mask_pred.astype(jnp.bfloat16).reshape(B * Q, h, w)
    pts = coords.reshape(B * Q, P, 2)
    return point_sample(flat, pts).reshape(B, Q, P)


def _sample_gt_per_query(label_map: jax.Array, coords: jax.Array,
                         q_labels: jax.Array) -> jax.Array:
    """Gt indicator of each query's class at its own points.

    label_map (B, H, W); coords (B, Q, P, 2); q_labels (B, Q) -> (B, Q, P).

    Builds the per-query binary indicator maps and bilinearly samples them
    through `point_sample` (Pallas contraction kernel on TPU) — the gather
    formulation (take_along_axis of B*Q*P*4 flat indices) serialized on
    TPU and dominated the train step. Identical math: interpolating the
    {0,1} indicator equals interpolating matching-corner weights.
    """
    B, H, W = label_map.shape
    Q, P = coords.shape[1:3]
    # bf16 indicator: {0,1} exact, halves the (B*Q, H, W) HBM footprint
    # (400 MB in f32 at the 512px flagship); interpolation weights round at
    # 2^-8 which is immaterial for loss targets
    ind = (label_map[:, None] == q_labels[:, :, None, None]).astype(
        jnp.bfloat16)                                     # (B, Q, H, W)
    out = point_sample(ind.reshape(B * Q, H, W),
                       coords.reshape(B * Q, P, 2))
    return out.reshape(B, Q, P).astype(jnp.float32)


def mask2former_loss(
    rng: jax.Array,
    cls_list: Sequence[jax.Array],
    mask_list: Sequence[jax.Array],
    label_map: jax.Array,
    num_classes: int,
    max_instances: int = 60,
    **kwargs,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Sum of per-decoder-layer losses (reference `loss`:360-402: every layer
    weighted equally, aux layers logged as d{i}.*)."""
    gt_labels, gt_valid = present_classes(label_map, num_classes, max_instances)
    total = 0.0
    logs = {}
    rngs = jax.random.split(rng, len(cls_list) + 1)
    # all layers' Hungarian assignments in ONE device pass (the auction is
    # latency-bound; L sequential solves cost ~L x one batched solve)
    assign_all = _assign_all_layers(
        rngs[-1], jnp.stack(cls_list), jnp.stack(mask_list), label_map,
        gt_labels, gt_valid,
        num_points=kwargs.get("num_points", 12544),
        cost_cls=kwargs.get("loss_cls_weight", 2.0),
        cost_mask=kwargs.get("loss_mask_weight", 5.0),
        cost_dice=kwargs.get("loss_dice_weight", 5.0))
    for i, (cls_p, mask_p) in enumerate(zip(cls_list, mask_list)):
        out = loss_single_layer(rngs[i], cls_p, mask_p, label_map,
                                gt_labels, gt_valid, num_classes,
                                assign=assign_all[i], **kwargs)
        total = total + out["loss_cls"] + out["loss_mask"] + out["loss_dice"]
        if i == len(cls_list) - 1:
            logs.update(out)
        else:
            logs.update({f"d{i}.{k}": v for k, v in out.items()})
    return total, logs
