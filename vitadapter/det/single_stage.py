"""One-stage detectors: ATSS and GFL heads.

Parity targets: mmdet `ATSSHead` / `GFLHead` as used by the reference config
collections (`detection/configs/atss/`, `detection/configs/gfl/`):
  * shared tower: 4 conv+GN+ReLU stacks for cls and reg
  * ATSS: focal cls + GIoU reg (centerness-weighted) + BCE centerness;
    adaptive sample selection (top-k=9 by center distance per level, IoU
    threshold = mean + std, center-in-box constraint)
  * GFL: quality focal loss (IoU-soft cls targets), distribution focal loss
    over 16 discrete bins (integral regression), GIoU.
Static budgets: anchors per level fixed by feature shape; losses are
masked means — no dynamic shapes.
"""

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vitadapter.det.anchors import multi_level_anchors
from vitadapter.det.boxes import batched_nms, bbox_overlaps
from vitadapter.det.losses import giou, sigmoid_focal_loss
from vitadapter.det.necks import FPN

ATSS_STRIDES = (8, 16, 32, 64, 128)


class ConvTower(nn.Module):
    num_convs: int = 4
    channels: int = 256
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            x = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                             dtype=self.dtype, name=f"gn_{i}")(x)
            x = nn.relu(x)
        return x


class ATSSHead(nn.Module):
    """Shared-tower head emitting cls / box-delta / centerness per level."""

    num_classes: int = 80
    channels: int = 256
    num_levels: int = 5
    reg_max: int = 0   # 0 = plain 4-delta regression (ATSS); >0 = GFL bins
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        cls_tower = ConvTower(channels=self.channels, dtype=self.dtype,
                              name="cls_tower")
        reg_tower = ConvTower(channels=self.channels, dtype=self.dtype,
                              name="reg_tower")
        n_reg = 4 * (self.reg_max + 1) if self.reg_max else 4
        cls_conv = nn.Conv(self.num_classes, (3, 3), padding=1,
                           dtype=jnp.float32,
                           bias_init=nn.initializers.constant(-4.595),
                           name="atss_cls")
        reg_conv = nn.Conv(n_reg, (3, 3), padding=1, dtype=jnp.float32,
                           name="atss_reg")
        ctr_conv = nn.Conv(1, (3, 3), padding=1, dtype=jnp.float32,
                           name="atss_centerness")
        scales = self.param("scales", nn.initializers.ones,
                            (self.num_levels,), jnp.float32)
        cls_out, reg_out, ctr_out = [], [], []
        for i, f in enumerate(feats):
            c = cls_tower(f)
            r = reg_tower(f)
            cls_out.append(cls_conv(c))
            reg_out.append(reg_conv(r) * scales[i])
            ctr_out.append(ctr_conv(r))
        return cls_out, reg_out, ctr_out


def atss_assign(anchors: jax.Array, num_per_level: Sequence[int],
                gt_boxes: jax.Array, gt_valid: jax.Array,
                topk: int = 9) -> jax.Array:
    """Adaptive training sample selection. Returns (N,) assigned gt or -1."""
    N = anchors.shape[0]
    G = gt_boxes.shape[0]
    iou = bbox_overlaps(anchors, gt_boxes)  # (N, G)
    ac = jnp.stack([(anchors[:, 0] + anchors[:, 2]) / 2,
                    (anchors[:, 1] + anchors[:, 3]) / 2], -1)
    gc = jnp.stack([(gt_boxes[:, 0] + gt_boxes[:, 2]) / 2,
                    (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2], -1)
    dist = jnp.linalg.norm(ac[:, None] - gc[None, :], axis=-1)  # (N, G)

    # top-k closest anchors per level per gt -> candidate mask (N, G)
    cand = jnp.zeros((N, G), bool)
    start = 0
    for n in num_per_level:
        d = dist[start:start + n]  # (n, G)
        k = min(topk, n)
        _, idx = jax.lax.top_k(-d.T, k)  # (G, k)
        lvl_cand = jnp.zeros((G, n), bool).at[
            jnp.arange(G)[:, None], idx].set(True)
        cand = cand.at[start:start + n].set(lvl_cand.T)
        start += n

    # IoU stats over candidates per gt
    cand_iou = jnp.where(cand, iou, jnp.nan)
    mean = jnp.nanmean(cand_iou, axis=0)
    std = jnp.sqrt(jnp.nanmean((cand_iou - mean) ** 2, axis=0))
    thr = mean + std  # (G,)

    # center-in-gt constraint
    inside = ((ac[:, None, 0] > gt_boxes[None, :, 0])
              & (ac[:, None, 0] < gt_boxes[None, :, 2])
              & (ac[:, None, 1] > gt_boxes[None, :, 1])
              & (ac[:, None, 1] < gt_boxes[None, :, 3]))
    pos = cand & (iou >= thr[None, :]) & inside & gt_valid[None, :]
    # each anchor takes the gt with highest IoU among its positives
    best = jnp.argmax(jnp.where(pos, iou, -1.0), axis=1).astype(jnp.int32)
    assigned = jnp.where(pos.any(axis=1), best, -1)
    return assigned


def centerness_target(anchors: jax.Array, gts: jax.Array) -> jax.Array:
    ac = jnp.stack([(anchors[:, 0] + anchors[:, 2]) / 2,
                    (anchors[:, 1] + anchors[:, 3]) / 2], -1)
    l = ac[:, 0] - gts[:, 0]
    r = gts[:, 2] - ac[:, 0]
    t = ac[:, 1] - gts[:, 1]
    b = gts[:, 3] - ac[:, 1]
    lr = jnp.clip(jnp.minimum(l, r) / jnp.maximum(jnp.maximum(l, r), 1e-6),
                  0, 1)
    tb = jnp.clip(jnp.minimum(t, b) / jnp.maximum(jnp.maximum(t, b), 1e-6),
                  0, 1)
    return jnp.sqrt(lr * tb)


def decode_atss_deltas(anchors: jax.Array, deltas: jax.Array) -> jax.Array:
    """ATSS regresses (l, t, r, b) distances scaled by anchor stride-size."""
    ac = jnp.stack([(anchors[..., 0] + anchors[..., 2]) / 2,
                    (anchors[..., 1] + anchors[..., 3]) / 2], -1)
    wh = jnp.stack([anchors[..., 2] - anchors[..., 0],
                    anchors[..., 3] - anchors[..., 1]], -1)
    scale = jnp.concatenate([wh, wh], -1) * 0.125  # stride = anchor size / 8
    d = deltas * scale
    return jnp.stack([ac[..., 0] - d[..., 0], ac[..., 1] - d[..., 1],
                      ac[..., 0] + d[..., 2], ac[..., 1] + d[..., 3]], -1)


def gfl_integral(reg_logits: jax.Array, reg_max: int) -> jax.Array:
    """Distribution -> expected distance (GFL integral regression).

    reg_logits (..., 4*(reg_max+1)) -> (..., 4) expected bin values.
    """
    n = reg_max + 1
    p = jax.nn.softmax(reg_logits.reshape(*reg_logits.shape[:-1], 4, n), -1)
    bins = jnp.arange(n, dtype=jnp.float32)
    return (p * bins).sum(-1)


def distribution_focal_loss(reg_logits: jax.Array, target: jax.Array,
                            reg_max: int) -> jax.Array:
    """DFL: CE against the two bins bracketing the continuous target.

    reg_logits (..., 4*(reg_max+1)); target (..., 4) in [0, reg_max].
    """
    n = reg_max + 1
    logits = reg_logits.reshape(*reg_logits.shape[:-1], 4, n)
    t = jnp.clip(target, 0, reg_max - 1e-4)
    lo = jnp.floor(t).astype(jnp.int32)
    hi = lo + 1
    w_hi = t - lo
    w_lo = 1 - w_hi
    logp = jax.nn.log_softmax(logits, -1)
    nll_lo = -jnp.take_along_axis(logp, lo[..., None], -1)[..., 0]
    nll_hi = -jnp.take_along_axis(logp, hi[..., None], -1)[..., 0]
    return (w_lo * nll_lo + w_hi * nll_hi).sum(-1)


def quality_focal_loss(logits: jax.Array, labels: jax.Array,
                       quality: jax.Array, num_classes: int,
                       beta: float = 2.0) -> jax.Array:
    """QFL: soft focal with IoU-quality targets at the gt class.

    logits (N, K); labels (N,) with num_classes = bg; quality (N,) IoU.
    """
    t = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32) * quality[:, None]
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    ce = jnp.maximum(logits, 0) - logits * t + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return (jnp.abs(t - p) ** beta * ce).sum(-1)


class ATSS(nn.Module):
    """Single-stage ATSS (or GFL when reg_max > 0) detector."""

    backbone: nn.Module
    num_classes: int = 80
    fpn_channels: int = 256
    reg_max: int = 0  # 16 for GFL
    max_dets: int = 100
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # reference ATSS/GFL configs: start_level=1 (drop stride 4) +
        # add_extra_convs='on_output' -> pyramid strides 8..128 matching
        # ATSS_STRIDES (`configs/atss/atss_deit_adapter_small...py:30-36`)
        self.neck = FPN(out_channels=self.fpn_channels, num_outs=5,
                        start_level=1, extra="on_output", dtype=self.dtype)
        self.head = ATSSHead(num_classes=self.num_classes,
                             channels=self.fpn_channels,
                             reg_max=self.reg_max, dtype=self.dtype)

    def _anchors(self, feats):
        # ATSS uses a single anchor per cell (scale 8, ratio 1)
        return multi_level_anchors([f.shape[1:3] for f in feats],
                                   ATSS_STRIDES[:len(feats)], scales=(8,),
                                   ratios=(1.0,))

    def __call__(self, img, train: bool = False, gt_boxes=None,
                 gt_labels=None, gt_valid=None, rng=None):
        B, H, W, _ = img.shape
        feats = self.neck(self.backbone(img, train=train))
        cls_out, reg_out, ctr_out = self.head(feats)
        lvl_anchors = self._anchors(feats)
        anchors = jnp.asarray(np.concatenate(lvl_anchors, 0))
        num_per_level = [a.shape[0] for a in lvl_anchors]
        K = self.num_classes
        n_reg = 4 * (self.reg_max + 1) if self.reg_max else 4
        cls = jnp.concatenate([c.reshape(B, -1, K) for c in cls_out], 1)
        reg = jnp.concatenate([r.reshape(B, -1, n_reg) for r in reg_out], 1)
        ctr = jnp.concatenate([c.reshape(B, -1) for c in ctr_out], 1)
        if self.reg_max:
            dist = gfl_integral(reg, self.reg_max)
        else:
            dist = reg
        boxes = decode_atss_deltas(anchors[None], dist)
        boxes = jnp.clip(boxes, 0, jnp.asarray([W, H, W, H], jnp.float32))

        if not train:
            def per_image(c, b, ct):
                if self.reg_max:
                    scores = jax.nn.sigmoid(c)
                else:
                    scores = jax.nn.sigmoid(c) * jax.nn.sigmoid(ct)[:, None]
                flat = scores.reshape(-1)
                pre = min(2048, flat.shape[0])
                top_s, top_i = jax.lax.top_k(flat, pre)
                a_idx = top_i // K
                labels = (top_i % K).astype(jnp.int32)
                return batched_nms(b[a_idx], top_s, labels, 0.6,
                                   self.max_dets,
                                   valid=top_s > 0.05)
            ob, os_, ol, _ = jax.vmap(per_image)(cls, boxes, ctr)
            return {"boxes": ob, "scores": os_, "labels": ol}

        def per_image(c, b_pred, ct, r_logits, gtb, gtl, gtv):
            assigned = atss_assign(anchors, num_per_level, gtb, gtv)
            pos = assigned >= 0
            safe = jnp.maximum(assigned, 0)
            tgt_box = gtb[safe]
            labels = jnp.where(pos, gtl[safe], K)
            n_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
            g = giou(b_pred, tgt_box)
            if self.reg_max:
                quality = jnp.where(
                    pos, jax.lax.stop_gradient(
                        jnp.clip(bbox_overlaps(b_pred, gtb).max(-1), 0, 1)),
                    0.0)
                loss_cls = quality_focal_loss(c, labels, quality, K).sum() / n_pos
                # DFL on positive anchors
                ac = jnp.stack([(anchors[:, 0] + anchors[:, 2]) / 2,
                                (anchors[:, 1] + anchors[:, 3]) / 2], -1)
                wh = (anchors[:, 2] - anchors[:, 0])[:, None] * 0.125
                t = jnp.concatenate([ac - tgt_box[:, :2],
                                     tgt_box[:, 2:] - ac], -1) / wh
                dfl = distribution_focal_loss(r_logits, t, self.reg_max)
                loss_dfl = jnp.where(pos, dfl, 0.0).sum() / n_pos * 0.25
                loss_box = jnp.where(pos, 1 - g, 0.0).sum() / n_pos * 2.0
                return loss_cls, loss_box, loss_dfl
            onehot = jax.nn.one_hot(labels, K, dtype=jnp.float32)
            loss_cls = sigmoid_focal_loss(c.astype(jnp.float32),
                                          onehot).sum() / n_pos
            ct_tgt = centerness_target(anchors, tgt_box)
            loss_box = (jnp.where(pos, (1 - g) * ct_tgt, 0.0).sum()
                        / jnp.maximum(jnp.where(pos, ct_tgt, 0).sum(), 1e-6)
                        * 2.0)
            bce = jnp.maximum(ct, 0) - ct * ct_tgt + \
                jnp.log1p(jnp.exp(-jnp.abs(ct)))
            loss_ctr = jnp.where(pos, bce, 0.0).sum() / n_pos
            return loss_cls, loss_box, loss_ctr

        la, lb, lc = jax.vmap(per_image)(cls, boxes, ctr, reg, gt_boxes,
                                         gt_labels, gt_valid)
        names = (("loss_cls", "loss_bbox", "loss_dfl") if self.reg_max
                 else ("loss_cls", "loss_bbox", "loss_centerness"))
        losses = {names[0]: la.mean(), names[1]: lb.mean(),
                  names[2]: lc.mean()}
        losses["loss"] = sum(losses.values())
        return losses
