"""RoI heads: Shared2FC bbox head + FCN mask head (+ losses, decoding).

Parity targets: mmdet `Shared2FCBBoxHead` (7x7x256 -> fc1024 -> fc1024 ->
cls K+1 / reg 4K class-specific, target stds (0.1,0.1,0.2,0.2)) and
`FCNMaskHead` (4x conv3x3-256 + deconv2x + 1x1 -> K mask logits at 28^2),
as configured by the reference Mask R-CNN family.
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitadapter.det.boxes import (RCNN_STDS, batched_nms, bbox2delta,
                                  delta2bbox)


class Shared2FCBBoxHead(nn.Module):
    num_classes: int = 80
    fc_dim: int = 1024
    reg_class_agnostic: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jax.Array):
        """roi_feats (R, 7, 7, C) -> (cls_logits (R, K+1), deltas (R, K|1, 4))."""
        R = roi_feats.shape[0]
        x = roi_feats.reshape(R, -1)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc2")(x))
        cls = nn.Dense(self.num_classes + 1, dtype=jnp.float32,
                       name="fc_cls")(x)
        n_reg = 1 if self.reg_class_agnostic else self.num_classes
        reg = nn.Dense(n_reg * 4, dtype=jnp.float32, name="fc_reg")(x)
        return cls, reg.reshape(R, n_reg, 4)


class FCNMaskHead(nn.Module):
    num_classes: int = 80
    channels: int = 256
    num_convs: int = 4
    return_feat: bool = False  # HTC mask information flow
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jax.Array,
                 prev_feat: Optional[jax.Array] = None):
        """roi_feats (R, 14, 14, C) -> mask logits (R, 28, 28, K).

        With `prev_feat` (HTC info flow, mmdet HTCMaskHead): the previous
        stage's conv features pass through a 1x1 conv and are added before
        this stage's tower.
        """
        x = roi_feats
        if self.return_feat:
            # HTC mode: mmdet's HTCMaskHead owns conv_res_feat in EVERY
            # stage (stage 0 just never uses it) — materialize the params
            # so converted checkpoints cover the tree; the zero multiply
            # keeps stage 0 an exact no-op.
            res = nn.Conv(roi_feats.shape[-1], (1, 1), dtype=self.dtype,
                          name="conv_res_feat")
            if prev_feat is not None:
                x = x + res(prev_feat)
            else:
                x = x + 0.0 * res(x)
        elif prev_feat is not None:
            x = x + nn.Conv(roi_feats.shape[-1], (1, 1), dtype=self.dtype,
                            name="conv_res_feat")(prev_feat)
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.channels, (3, 3), padding=1,
                                dtype=self.dtype, name=f"conv_{i}")(x))
        feat = x
        x = nn.relu(nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="upsample")(x))
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         name="conv_logits")(x)
        if self.return_feat:
            return logits, feat
        return logits


def bbox_head_loss(cls_logits, deltas, sample, proposals, gt_boxes, gt_labels,
                   num_classes: int):
    """Softmax CE over sampled rois + L1 on positives (mmdet defaults).

    sample: SampleResult over proposals; gt_labels (G,) int32.
    """
    labels = jnp.where(sample.is_pos, gt_labels[sample.gt_idx], num_classes)
    w = sample.is_valid.astype(jnp.float32)
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    avg = jnp.maximum(w.sum(), 1.0)
    loss_cls = (nll * w).sum() / avg

    tgt = bbox2delta(proposals[sample.idx], gt_boxes[sample.gt_idx], RCNN_STDS)
    if deltas.shape[1] == 1:
        d = deltas[:, 0]
    else:
        d = jnp.take_along_axis(
            deltas, jnp.clip(labels, 0, num_classes - 1)[:, None, None]
            .repeat(4, -1), axis=1)[:, 0]
    l1 = jnp.abs(d - tgt).sum(-1)
    loss_reg = jnp.where(sample.is_pos, l1, 0.0).sum() / avg
    return loss_cls, loss_reg, labels


def mask_head_loss(mask_logits, sample, labels, gt_points):
    """BCE on the positive rois' gt-class mask at 28^2 targets.

    gt_points: (R, 28, 28) binary targets (gt masks roi-aligned by caller).
    """
    R = mask_logits.shape[0]
    safe = jnp.clip(labels, 0, mask_logits.shape[-1] - 1)
    logits = jnp.take_along_axis(
        mask_logits, safe[:, None, None, None], axis=-1)[..., 0]
    bce = jnp.maximum(logits, 0) - logits * gt_points + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    per_roi = bce.mean(axis=(1, 2))
    n_pos = jnp.maximum(sample.is_pos.sum(), 1)
    return jnp.where(sample.is_pos, per_roi, 0.0).sum() / n_pos


def decode_detections(cls_logits, deltas, proposals, img_hw,
                      score_thr: float = 0.05, iou_thr: float = 0.5,
                      max_per_img: int = 100, valid=None):
    """Per-class decode + NMS with static budget (mmdet multiclass_nms).

    Returns boxes (D, 4), scores (D,), labels (D,) with -inf/-1 padding.
    """
    K = cls_logits.shape[-1] - 1
    probs = jax.nn.softmax(cls_logits, axis=-1)[:, :K]  # (R, K)
    R = proposals.shape[0]
    if deltas.shape[1] == 1:
        boxes = delta2bbox(proposals, deltas[:, 0], RCNN_STDS, img_hw)
        boxes = jnp.broadcast_to(boxes[:, None], (R, K, 4))
    else:
        boxes = delta2bbox(proposals[:, None].repeat(K, 1), deltas,
                           RCNN_STDS, img_hw)
    flat_boxes = boxes.reshape(R * K, 4)
    flat_scores = probs.reshape(R * K)
    flat_labels = jnp.tile(jnp.arange(K, dtype=jnp.int32), (R,))
    ok = flat_scores > score_thr
    if valid is not None:
        ok = ok & jnp.repeat(valid, K)
    # static pre-NMS top-k keeps the O(N^2) NMS matrix small
    pre = min(2048, R * K)
    top_s, top_i = jax.lax.top_k(jnp.where(ok, flat_scores, -jnp.inf), pre)
    return batched_nms(flat_boxes[top_i], top_s, flat_labels[top_i], iou_thr,
                       max_per_img, valid=jnp.isfinite(top_s))
