"""Cascade (Mask) R-CNN and HTC++-style detector + detection TTA.

Parity targets:
  * mmdet `CascadeRCNN`/`HybridTaskCascade` as configured by the reference
    HTC++ configs (`htc++_beit_adapter_large_fpn_3x_coco.py`): 3 bbox stages
    with assigner IoUs (.5, .6, .7), class-agnostic regression in cascade
    stages, stage loss weights (1, .5, .25), per-stage mask heads averaged at
    test time, optional `ExtraAttention` on the coarsest level before FPN.
  * `HybridTaskCascadeAug` TTA (reference
    `detection/mmdet_custom/models/detectors/htc_aug.py:12-241`):
    multi-scale + flip results filtered per-scale by box-size ranges
    (`remove_boxes:43-65`), merged with soft-NMS (`:203-241`) — host-side.
"""

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vitadapter.det.anchors import multi_level_anchors
from vitadapter.det.assign import max_iou_assign, random_sample
from vitadapter.det.boxes import RCNN_STDS, delta2bbox
from vitadapter.det.necks import FPN, ExtraAttention
from vitadapter.det.roi_align import crop_resize_masks, multi_level_roi_align
from vitadapter.det.roi_heads import (FCNMaskHead, Shared2FCBBoxHead,
                                      bbox_head_loss, decode_detections,
                                      mask_head_loss)
from vitadapter.det.rpn import RPNHead, get_proposals, rpn_loss

FPN_STRIDES = (4, 8, 16, 32, 64)
STAGE_IOUS = (0.5, 0.6, 0.7)
STAGE_WEIGHTS = (1.0, 0.5, 0.25)
# mmdet cascade stage target stds tighten per stage
STAGE_STDS = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
              (1 / 30, 1 / 30, 1 / 15, 1 / 15))


class SemanticHead(nn.Module):
    """HTC semantic-fusion branch (mmdet FusedSemanticHead): fuse FPN levels
    at stride 8, conv tower, semantic logits + a feature map mixed into the
    RoI features of every stage."""

    num_semantic_classes: int = 183
    channels: int = 256
    num_convs: int = 4
    fusion_level: int = 1  # stride-8 FPN level
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        from vitadapter.utils.resize import resize_2d

        tgt = feats[self.fusion_level]
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                    name="lateral_fuse")(tgt)
        for i, f in enumerate(feats):
            if i == self.fusion_level:
                continue
            y = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                        name=f"lateral_{i}")(f)
            x = x + resize_2d(y, tgt.shape[1:3], "bilinear")
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.channels, (3, 3), padding=1,
                                dtype=self.dtype, name=f"conv_{i}")(x))
        seg = nn.Conv(self.num_semantic_classes, (1, 1), dtype=jnp.float32,
                      name="conv_seg")(x)
        feat = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                       name="conv_embedding")(x)
        return seg, feat


class CascadeRCNN(nn.Module):
    backbone: nn.Module
    num_classes: int = 80
    fpn_channels: int = 256
    num_stages: int = 3
    with_mask: bool = True
    use_extra_attention: bool = False
    with_semantic: bool = False      # HTC semantic-fusion branch
    mask_info_flow: bool = True      # HTC inter-stage mask feature flow
    num_semantic_classes: int = 183
    num_proposals: int = 1000
    num_roi_samples: int = 512
    max_dets: int = 100
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.extra_attn = (ExtraAttention(dtype=self.dtype)
                           if self.use_extra_attention else None)
        self.neck = FPN(out_channels=self.fpn_channels, num_outs=5,
                        dtype=self.dtype)
        self.rpn_head = RPNHead(num_anchors=3, channels=self.fpn_channels,
                                dtype=self.dtype)
        self.semantic_head = (SemanticHead(
            num_semantic_classes=self.num_semantic_classes,
            channels=self.fpn_channels, dtype=self.dtype)
            if self.with_semantic else None)
        self.bbox_heads = [
            Shared2FCBBoxHead(num_classes=self.num_classes,
                              reg_class_agnostic=True, dtype=self.dtype,
                              name=f"bbox_head_{i}")
            for i in range(self.num_stages)
        ]
        if self.with_mask:
            self.mask_heads = [
                FCNMaskHead(num_classes=self.num_classes,
                            channels=self.fpn_channels,
                            return_feat=self.mask_info_flow,
                            dtype=self.dtype, name=f"mask_head_{i}")
                for i in range(self.num_stages)
            ]

    def extract_feats(self, img, train: bool):
        feats = self.backbone(img, train=train)
        if self.extra_attn is not None:
            feats = self.extra_attn(feats)
        return self.neck(feats)

    def __call__(self, img, train: bool = False, gt_boxes=None,
                 gt_labels=None, gt_masks=None, gt_valid=None, rng=None,
                 gt_semantic=None):
        if train:
            return self.forward_train(img, gt_boxes, gt_labels, gt_masks,
                                      gt_valid, rng, gt_semantic=gt_semantic)
        return self.simple_test(img)

    def _mask_logits(self, mask_feats):
        """Run the mask-head cascade with HTC information flow; average."""
        acc = 0.0
        prev = None
        for head in self.mask_heads:
            if self.mask_info_flow:
                logits, prev = head(mask_feats, prev)
            else:
                logits = head(mask_feats)
            acc = acc + logits
        return acc / self.num_stages

    def simple_test(self, img):
        B, H, W, _ = img.shape
        feats = self.extract_feats(img, train=False)
        cls_out, reg_out = self.rpn_head(feats)
        lvl_anchors = multi_level_anchors([f.shape[1:3] for f in feats],
                                          FPN_STRIDES)
        props, _, p_valid = get_proposals(cls_out, reg_out, lvl_anchors,
                                          (H, W),
                                          max_per_img=self.num_proposals)
        sem_feat = None
        if self.semantic_head is not None:
            _, sem_feat = self.semantic_head(feats[:4])

        def per_image(feats_i, rois, valid, sem_i):
            from vitadapter.det.roi_align import roi_align

            def fuse_sem(rf, rois_, size):
                if sem_i is None:
                    return rf
                return rf + roi_align(sem_i, rois_, size, 1.0 / 8)

            ms_scores = []
            for s in range(self.num_stages):
                rf = multi_level_roi_align(feats_i[:4], rois, 7,
                                           FPN_STRIDES[:4])
                rf = fuse_sem(rf, rois, 7)
                cls_logits, deltas = self.bbox_heads[s](rf)
                ms_scores.append(jax.nn.softmax(cls_logits, -1))
                if s < self.num_stages - 1:
                    rois = delta2bbox(rois, deltas[:, 0], STAGE_STDS[s],
                                      (H, W))
            mean_probs = sum(ms_scores) / self.num_stages
            # decode final boxes from the last stage (class-agnostic)
            final = delta2bbox(rois, deltas[:, 0], STAGE_STDS[-1], (H, W))
            from vitadapter.det.boxes import batched_nms
            K = self.num_classes
            R = final.shape[0]
            flat_scores = mean_probs[:, :K].reshape(-1)
            flat_boxes = jnp.repeat(final, K, axis=0)
            flat_labels = jnp.tile(jnp.arange(K, dtype=jnp.int32), (R,))
            ok = (flat_scores > 0.05) & jnp.repeat(valid, K)
            pre = min(2048, R * K)
            top_s, top_i = jax.lax.top_k(
                jnp.where(ok, flat_scores, -jnp.inf), pre)
            boxes, scores, labels, keep = batched_nms(
                flat_boxes[top_i], top_s, flat_labels[top_i], 0.5,
                self.max_dets, valid=jnp.isfinite(top_s))
            out = {"boxes": boxes, "scores": scores, "labels": labels}
            if self.with_mask:
                mf = multi_level_roi_align(feats_i[:4], boxes, 14,
                                           FPN_STRIDES[:4])
                mf = fuse_sem(mf, boxes, 14)
                logits = self._mask_logits(mf)
                safe = jnp.clip(labels, 0, self.num_classes - 1)
                out["masks"] = jnp.take_along_axis(
                    jax.nn.sigmoid(logits), safe[:, None, None, None],
                    axis=-1)[..., 0]
            return out

        return jax.vmap(per_image)([f for f in feats], props, p_valid,
                                   sem_feat)

    def forward_train(self, img, gt_boxes, gt_labels, gt_masks, gt_valid,
                      rng, gt_semantic=None):
        B, H, W, _ = img.shape
        feats = self.extract_feats(img, train=True)
        cls_out, reg_out = self.rpn_head(feats)
        lvl_anchors = multi_level_anchors([f.shape[1:3] for f in feats],
                                          FPN_STRIDES)
        anchors = jnp.asarray(np.concatenate(lvl_anchors, axis=0))
        r_rpn, r_roi = jax.random.split(rng)
        losses = rpn_loss(cls_out, reg_out, anchors, gt_boxes, gt_valid,
                          r_rpn, (H, W))
        props, _, p_valid = get_proposals(cls_out, reg_out, lvl_anchors,
                                          (H, W),
                                          max_per_img=self.num_proposals)
        props = jax.lax.stop_gradient(props)

        sem_feat = None
        if self.semantic_head is not None:
            sem_seg, sem_feat = self.semantic_head(feats[:4])
            if gt_semantic is not None:
                from vitadapter.models.segmentor import cross_entropy_loss
                from vitadapter.utils.resize import resize_hw

                tgt = resize_hw(gt_semantic.astype(jnp.float32),
                                sem_seg.shape[1:3], "bilinear")
                losses["loss_semantic"] = cross_entropy_loss(
                    sem_seg, jnp.round(tgt).astype(jnp.int32)) * 0.2

        def per_image(rng_i, feats_i, rois, roi_valid, gtb, gtl, gtm, gtv,
                      sem_i):
            from vitadapter.det.roi_align import roi_align

            def fuse_sem(rf, rois_, size):
                if sem_i is None:
                    return rf
                return rf + roi_align(sem_i, rois_, size, 1.0 / 8)

            out = {}
            rois = jnp.concatenate([rois, gtb], axis=0)
            roi_valid = jnp.concatenate([roi_valid, gtv], axis=0)
            for s in range(self.num_stages):
                rng_i, rs = jax.random.split(rng_i)
                thr = STAGE_IOUS[s]
                assigned, _ = max_iou_assign(rois, gtb, gtv, thr, thr, thr,
                                             match_low_quality=False)
                assigned = jnp.where(roi_valid, assigned, -2)
                samp = random_sample(rs, assigned, self.num_roi_samples, 0.25)
                rf = multi_level_roi_align(feats_i[:4], rois[samp.idx], 7,
                                           FPN_STRIDES[:4])
                rf = fuse_sem(rf, rois[samp.idx], 7)
                cls_logits, deltas = self.bbox_heads[s](rf)
                lc, lr, labels = bbox_head_loss(
                    cls_logits, deltas, samp, rois, gtb, gtl,
                    self.num_classes)
                w = STAGE_WEIGHTS[s]
                out[f"s{s}.loss_cls"] = lc * w
                out[f"s{s}.loss_bbox"] = lr * w
                if self.with_mask:
                    mf = multi_level_roi_align(feats_i[:4], rois[samp.idx],
                                               14, FPN_STRIDES[:4])
                    mf = fuse_sem(mf, rois[samp.idx], 14)
                    if self.mask_info_flow:
                        # HTC: chain features through the earlier heads
                        prev = None
                        for t in range(s):
                            _, prev = self.mask_heads[t](mf, prev)
                        mlogits, _ = self.mask_heads[s](mf, prev)
                    else:
                        mlogits = self.mask_heads[s](mf)
                    tgt = crop_resize_masks(gtm, rois[samp.idx], samp.gt_idx,
                                            28)
                    out[f"s{s}.loss_mask"] = mask_head_loss(
                        mlogits, samp, labels, tgt) * w
                # refine ALL rois for the next stage with this stage's head
                if s < self.num_stages - 1:
                    rf_all = multi_level_roi_align(feats_i[:4], rois, 7,
                                                   FPN_STRIDES[:4])
                    rf_all = fuse_sem(rf_all, rois, 7)
                    _, deltas_all = self.bbox_heads[s](rf_all)
                    rois = jax.lax.stop_gradient(
                        delta2bbox(rois, deltas_all[:, 0], STAGE_STDS[s],
                                   (H, W)))
            return out

        rngs = jax.random.split(r_roi, B)
        stage_losses = jax.vmap(per_image)(
            rngs, [f for f in feats], props, p_valid, gt_boxes, gt_labels,
            gt_masks, gt_valid, sem_feat)
        losses.update({k: v.mean() for k, v in stage_losses.items()})
        losses["loss"] = sum(losses.values())
        return losses


# ----------------------------------------------------------------- TTA utils

# Named area bands of the reference per-scale gate (`htc_aug.py:43-65`):
# box AREAS in the original image frame, boundaries at 32^2 / 64^2 / 96^2 /
# 512^2 pixels^2. A band list like ['s', 'm'] keeps the union of bands.
_AREA_BANDS = {
    "s": (-1.0, 32.0 ** 2),
    "m": (32.0 ** 2, 96.0 ** 2),
    "m-": (32.0 ** 2, 64.0 ** 2),
    "m+": (64.0 ** 2, 96.0 ** 2),
    "l": (96.0 ** 2, float("inf")),
    "l-": (96.0 ** 2, 512.0 ** 2),
    "l+": (512.0 ** 2, float("inf")),
}

# bands whose upper bound is exclusive in the reference rule
# (`htc_aug.py:59`: 'l-' keeps areas < 512^2, not <=)
_STRICT_HI = {"l-"}


def remove_boxes_by_scale(boxes: np.ndarray, scale_range) -> np.ndarray:
    """Per-scale TTA box gate (reference `htc_aug.py:43-65`).

    `scale_range` is either the reference's named band list (e.g.
    ``['s', 'm']`` — keep boxes whose AREA falls in any named band, with the
    reference's (0,1e24]/32^2/96^2/... boundaries) or a numeric
    ``[lo, hi)`` range on sqrt-area.
    """
    area = np.clip((boxes[:, 2] - boxes[:, 0])
                   * (boxes[:, 3] - boxes[:, 1]), 0, None)
    if len(scale_range) and isinstance(scale_range[0], str):
        keep = np.zeros(len(boxes), bool)
        for band in scale_range:
            lo, hi = _AREA_BANDS[band]
            up = (area < hi) if band in _STRICT_HI else (area <= hi)
            keep |= (area > lo) & up
        return keep
    s = np.sqrt(area)
    return (s >= scale_range[0]) & (s < scale_range[1])


def soft_nms(boxes: np.ndarray, scores: np.ndarray, iou_thr: float = 0.5,
             sigma: float = 0.5, score_thr: float = 1e-3,
             method: str = "gaussian") -> Tuple[np.ndarray, np.ndarray]:
    """Host-side soft-NMS (reference merge step uses mmcv soft_nms)."""
    boxes = boxes.copy().astype(np.float64)
    scores = scores.copy().astype(np.float64)
    N = len(boxes)
    keep = []
    idxs = np.arange(N)
    while len(idxs) > 0:
        i = idxs[np.argmax(scores[idxs])]
        if scores[i] < score_thr:
            break
        keep.append(i)
        idxs = idxs[idxs != i]
        if len(idxs) == 0:
            break
        ix = np.maximum(0, np.minimum(boxes[idxs, 2], boxes[i, 2])
                        - np.maximum(boxes[idxs, 0], boxes[i, 0]))
        iy = np.maximum(0, np.minimum(boxes[idxs, 3], boxes[i, 3])
                        - np.maximum(boxes[idxs, 1], boxes[i, 1]))
        inter = ix * iy
        union = ((boxes[idxs, 2] - boxes[idxs, 0])
                 * (boxes[idxs, 3] - boxes[idxs, 1])
                 + (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                 - inter)
        iou = inter / np.maximum(union, 1e-9)
        if method == "gaussian":
            scores[idxs] *= np.exp(-(iou ** 2) / sigma)
        else:
            scores[idxs] = np.where(iou > iou_thr,
                                    scores[idxs] * (1 - iou), scores[idxs])
    keep = np.asarray(keep, np.int64)
    return keep, scores[keep]


def merge_aug_detections(per_aug: List[Dict[str, np.ndarray]],
                         scale_ranges: Optional[List] = None,
                         iou_thr: float = 0.5,
                         max_dets: int = 100) -> Dict[str, np.ndarray]:
    """Merge multi-scale+flip detections (already mapped back to the original
    image frame) with per-scale size gating + soft-NMS per class
    (reference `htc_aug.py:203-241`: gate each aug via `remove_boxes`, concat,
    multiclass soft-NMS capped at `max_per_img`).

    If the per-aug dicts carry ``masks`` (box-frame mask crops, which are
    scale-independent), each surviving detection keeps the crop from the aug
    that produced it. (The reference instead re-runs the mask head on the
    merged boxes under every aug and averages — that requires a
    box-conditioned head forward; the surviving-source crop is the
    single-pass approximation.)
    """
    with_masks = all("masks" in r for r in per_aug) and len(per_aug) > 0
    all_b, all_s, all_l, all_m = [], [], [], []
    for k, r in enumerate(per_aug):
        b = np.asarray(r["boxes"])
        s = np.asarray(r["scores"])
        l = np.asarray(r["labels"])
        ok = np.isfinite(s)
        if scale_ranges is not None:
            ok &= remove_boxes_by_scale(b, scale_ranges[k])
        all_b.append(b[ok])
        all_s.append(s[ok])
        all_l.append(l[ok])
        if with_masks:
            all_m.append(np.asarray(r["masks"])[ok])
    boxes = np.concatenate(all_b)
    scores = np.concatenate(all_s)
    labels = np.concatenate(all_l)
    masks = np.concatenate(all_m) if with_masks else None
    out_b, out_s, out_l, out_m = [], [], [], []
    for c in np.unique(labels):
        m = labels == c
        keep, new_s = soft_nms(boxes[m], scores[m], iou_thr)
        out_b.append(boxes[m][keep])
        out_s.append(new_s)
        out_l.append(np.full(len(keep), c, labels.dtype))
        if with_masks:
            out_m.append(masks[m][keep])
    boxes = np.concatenate(out_b) if out_b else np.zeros((0, 4))
    scores = np.concatenate(out_s) if out_s else np.zeros((0,))
    labels = np.concatenate(out_l) if out_l else np.zeros((0,), np.int64)
    order = np.argsort(-scores)[:max_dets]
    out = {"boxes": boxes[order], "scores": scores[order],
           "labels": labels[order]}
    if with_masks:
        masks = (np.concatenate(out_m) if out_m
                 else np.zeros((0, 28, 28), np.float32))
        out["masks"] = masks[order]
    return out
