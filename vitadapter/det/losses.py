"""Detection losses and matching costs for the DETR/DINO family.

Parity targets: mmdet `FocalLoss` (sigmoid, alpha .25, gamma 2),
`GIoULoss`, `L1Loss`, and the match costs used by the reference DINO config
(`wsdm2023/configs/_base_/.../dino`: FocalLossCost 2.0 / BBoxL1Cost 5.0
(xywh) / IoUCost giou 2.0). Reference loss table also covers the vendored
seg losses (`segmentation/mmseg_custom/models/losses/`).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jax.Array, targets: jax.Array,
                       alpha: float = 0.25, gamma: float = 2.0) -> jax.Array:
    """Per-element focal loss; targets in {0, 1} (same shape as logits)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return a_t * ((1 - p_t) ** gamma) * ce


def giou(boxes1: jax.Array, boxes2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Generalized IoU for aligned xyxy box pairs (..., 4)."""
    area1 = jnp.clip(boxes1[..., 2] - boxes1[..., 0], 0) * \
        jnp.clip(boxes1[..., 3] - boxes1[..., 1], 0)
    area2 = jnp.clip(boxes2[..., 2] - boxes2[..., 0], 0) * \
        jnp.clip(boxes2[..., 3] - boxes2[..., 1], 0)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / jnp.maximum(union, eps)
    # smallest enclosing box
    lt_e = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_e = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_e = jnp.clip(rb_e - lt_e, 0)
    enclose = jnp.maximum(wh_e[..., 0] * wh_e[..., 1], eps)
    return iou - (enclose - union) / enclose


def giou_pairwise(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N, 4) x (M, 4) -> (N, M) GIoU matrix."""
    return giou(a[:, None, :], b[None, :, :])


def cxcywh_to_xyxy(b: jax.Array) -> jax.Array:
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def xyxy_to_cxcywh(b: jax.Array) -> jax.Array:
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1)


def focal_cost(cls_logits: jax.Array, gt_labels: jax.Array,
               weight: float = 1.0, alpha: float = 0.25,
               gamma: float = 2.0, eps: float = 1e-8) -> jax.Array:
    """mmdet FocalLossCost: pos_cost - neg_cost for each (query, gt) pair.

    cls_logits (Q, K) sigmoid logits; gt_labels (G,) -> (Q, G).
    """
    p = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    neg = (1 - alpha) * (p ** gamma) * (-jnp.log(1 - p + eps))
    pos = alpha * ((1 - p) ** gamma) * (-jnp.log(p + eps))
    return (pos - neg)[:, gt_labels] * weight


def bbox_l1_cost(pred_cxcywh: jax.Array, gt_cxcywh: jax.Array,
                 weight: float = 1.0) -> jax.Array:
    """(Q, 4) x (G, 4) normalized cxcywh -> (Q, G) L1 cost."""
    return jnp.abs(pred_cxcywh[:, None] - gt_cxcywh[None, :]).sum(-1) * weight


def giou_cost(pred_xyxy: jax.Array, gt_xyxy: jax.Array,
              weight: float = 1.0) -> jax.Array:
    return -giou_pairwise(pred_xyxy, gt_xyxy) * weight


def inverse_sigmoid(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x) - jnp.log1p(-x)
