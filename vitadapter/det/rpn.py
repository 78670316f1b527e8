"""Region Proposal Network: head, loss, proposal generation.

Parity targets: mmdet `RPNHead` as configured by the reference Mask R-CNN
configs — shared 3x3 conv + 1x1 sigmoid cls (A anchors) + 1x1 reg (4A);
training CE(sigmoid) + L1 on 256 sampled anchors/image (pos_fraction 0.5,
assigner 0.7/0.3); proposals via per-level top-k -> decode -> NMS(0.7) with
static budgets (nms_pre 1000, max_per_img 1000).
"""

from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vitadapter.det import anchors as anchor_lib
from vitadapter.det.assign import max_iou_assign, random_sample
from vitadapter.det.boxes import RPN_STDS, bbox2delta, delta2bbox, nms


class RPNHead(nn.Module):
    num_anchors: int = 3
    channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        conv = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       name="rpn_conv")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=jnp.float32,
                      name="rpn_cls")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=jnp.float32,
                      name="rpn_reg")
        cls_out, reg_out = [], []
        for f in feats:
            x = nn.relu(conv(f))
            cls_out.append(cls(x))
            reg_out.append(reg(x))
        return cls_out, reg_out


def flatten_levels(cls_out, reg_out):
    """Per-level NHW(A)/NHW(4A) maps -> (B, sumN, 1)/(B, sumN, 4)."""
    scores, deltas = [], []
    for c, r in zip(cls_out, reg_out):
        B, H, W, A = c.shape
        scores.append(c.reshape(B, H * W * A))
        deltas.append(r.reshape(B, H * W * A, 4))
    return jnp.concatenate(scores, 1), jnp.concatenate(deltas, 1)


def rpn_loss(cls_out, reg_out, anchors: jax.Array, gt_boxes, gt_valid, rng,
             img_hw: Tuple[int, int], num_samples: int = 256):
    """Mean CE + L1 loss over sampled anchors (batch of images)."""
    scores, deltas = flatten_levels(cls_out, reg_out)
    B = scores.shape[0]
    H, W = img_hw
    # drop anchors outside the image (mmdet allowed_border=0)
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0) &
              (anchors[:, 2] <= W) & (anchors[:, 3] <= H))

    def per_image(rng, score, delta, gtb, gtv):
        assigned, _ = max_iou_assign(anchors, gtb, gtv, 0.7, 0.3, 0.3)
        assigned = jnp.where(inside, assigned, -2)
        s = random_sample(rng, assigned, num_samples, 0.5)
        tgt_cls = s.is_pos.astype(jnp.float32)
        w_cls = s.is_valid.astype(jnp.float32)
        sc = jnp.take(score, s.idx)
        ce = jnp.maximum(sc, 0) - sc * tgt_cls + jnp.log1p(jnp.exp(-jnp.abs(sc)))
        loss_cls = (ce * w_cls).sum()
        pos_anchor = anchors[s.idx]
        pos_gt = gtb[s.gt_idx]
        tgt_delta = bbox2delta(pos_anchor, pos_gt, RPN_STDS)
        d = delta[s.idx]
        l1 = jnp.abs(d - tgt_delta).sum(-1)
        loss_reg = jnp.where(s.is_pos, l1, 0.0).sum()
        return loss_cls, loss_reg, w_cls.sum()

    rngs = jax.random.split(rng, B)
    lc, lr, n = jax.vmap(per_image)(rngs, scores, deltas, gt_boxes, gt_valid)
    denom = jnp.maximum(n.sum(), 1.0)
    return {"loss_rpn_cls": lc.sum() / denom,
            "loss_rpn_bbox": lr.sum() / denom}


def get_proposals(cls_out, reg_out, level_anchors: List[np.ndarray],
                  img_hw: Tuple[int, int], nms_pre: int = 1000,
                  max_per_img: int = 1000, iou_thr: float = 0.7,
                  min_box_size: float = 0.0):
    """Static-budget proposal generation.

    Returns (proposals (B, max_per_img, 4), scores (B, max_per_img),
    valid (B, max_per_img)).
    """
    B = cls_out[0].shape[0]
    all_boxes, all_scores = [], []
    for c, r, anc in zip(cls_out, reg_out, level_anchors):
        A = c.shape[-1]
        score = c.reshape(B, -1)
        delta = r.reshape(B, -1, 4)
        k = min(nms_pre, score.shape[1])
        top_s, top_i = jax.lax.top_k(score, k)
        top_d = jnp.take_along_axis(delta, top_i[..., None], axis=1)
        top_a = jnp.asarray(anc)[top_i]
        boxes = delta2bbox(top_a, top_d, RPN_STDS, max_shape=img_hw)
        all_boxes.append(boxes)
        all_scores.append(top_s)
    boxes = jnp.concatenate(all_boxes, axis=1)
    scores = jax.nn.sigmoid(jnp.concatenate(all_scores, axis=1))
    wh_ok = ((boxes[..., 2] - boxes[..., 0]) > min_box_size) & \
            ((boxes[..., 3] - boxes[..., 1]) > min_box_size)

    def per_image(b, s, ok):
        ob, os_, ki = nms(b, s, iou_thr, max_per_img, valid=ok)
        return ob, os_, ki >= 0

    return jax.vmap(per_image)(boxes, scores, wh_ok)
