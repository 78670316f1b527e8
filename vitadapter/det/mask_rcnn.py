"""Mask R-CNN detector: backbone -> FPN -> RPN -> RoI heads.

Parity target: mmdet `MaskRCNN` as configured by the reference
(`detection/configs/mask_rcnn/mask_rcnn_deit_adapter_tiny_fpn_3x_coco.py`):
ViTAdapter backbone, FPN-5, RPN (anchor scales [8], ratios [.5,1,2]),
Shared2FC bbox head (assigner .5/.5, sampler 512@.25, gt-as-proposals),
FCN mask head at 28^2. Static budgets everywhere: 1000 proposals, 512
sampled rois, 100 detections.
"""

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vitadapter.det.anchors import multi_level_anchors
from vitadapter.det.assign import max_iou_assign, random_sample
from vitadapter.det.boxes import RCNN_STDS
from vitadapter.det.necks import FPN
from vitadapter.det.roi_align import crop_resize_masks, multi_level_roi_align
from vitadapter.det.roi_heads import (FCNMaskHead, Shared2FCBBoxHead,
                                      bbox_head_loss, decode_detections,
                                      mask_head_loss)
from vitadapter.det.rpn import RPNHead, get_proposals, rpn_loss

FPN_STRIDES = (4, 8, 16, 32, 64)


class MaskRCNN(nn.Module):
    backbone: nn.Module
    num_classes: int = 80
    fpn_channels: int = 256
    num_proposals_test: int = 1000
    num_proposals_train: int = 1000
    num_roi_samples: int = 512
    max_dets: int = 100
    # "fpn" (default) or "channel_mapper" (ChannelMapperWithPooling — the
    # reference `mask_rcnn_deit_adapter_small_3x_coco.py` neck variant)
    neck_type: str = "fpn"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.neck_type == "channel_mapper":
            from vitadapter.det.necks import ChannelMapperWithPooling
            self.neck = ChannelMapperWithPooling(
                out_channels=self.fpn_channels, num_outs=5, dtype=self.dtype)
        else:
            self.neck = FPN(out_channels=self.fpn_channels, num_outs=5,
                            dtype=self.dtype)
        self.rpn_head = RPNHead(num_anchors=3, channels=self.fpn_channels,
                                dtype=self.dtype)
        self.bbox_head = Shared2FCBBoxHead(num_classes=self.num_classes,
                                           dtype=self.dtype)
        self.mask_head = FCNMaskHead(num_classes=self.num_classes,
                                     channels=self.fpn_channels,
                                     dtype=self.dtype)

    def extract_feats(self, img, train: bool):
        feats = self.backbone(img, train=train)
        return self.neck(feats)

    def __call__(self, img: jax.Array, train: bool = False,
                 gt_boxes: Optional[jax.Array] = None,
                 gt_labels: Optional[jax.Array] = None,
                 gt_masks: Optional[jax.Array] = None,
                 gt_valid: Optional[jax.Array] = None,
                 rng: Optional[jax.Array] = None):
        if train:
            return self.forward_train(img, gt_boxes, gt_labels, gt_masks,
                                      gt_valid, rng)
        return self.simple_test(img)

    # ------------------------------------------------------------------ test
    def simple_test(self, img: jax.Array) -> Dict[str, jax.Array]:
        B, H, W, _ = img.shape
        feats = self.extract_feats(img, train=False)
        cls_out, reg_out = self.rpn_head(feats)
        lvl_anchors = multi_level_anchors(
            [f.shape[1:3] for f in feats], FPN_STRIDES)
        props, p_scores, p_valid = get_proposals(
            cls_out, reg_out, lvl_anchors, (H, W),
            max_per_img=self.num_proposals_test)

        def per_image(feats_i, rois, valid):
            roi_feats = multi_level_roi_align(feats_i[:4], rois, 7,
                                              FPN_STRIDES[:4])
            cls_logits, deltas = self.bbox_head(roi_feats)
            boxes, scores, labels, keep = decode_detections(
                cls_logits, deltas, rois, (H, W), max_per_img=self.max_dets,
                valid=valid)
            mask_feats = multi_level_roi_align(feats_i[:4], boxes, 14,
                                               FPN_STRIDES[:4])
            mask_logits = self.mask_head(mask_feats)
            safe = jnp.clip(labels, 0, self.num_classes - 1)
            masks = jnp.take_along_axis(
                jax.nn.sigmoid(mask_logits), safe[:, None, None, None],
                axis=-1)[..., 0]
            return {"boxes": boxes, "scores": scores, "labels": labels,
                    "masks": masks}

        return jax.vmap(per_image)(
            [f for f in feats], props, p_valid)

    # ----------------------------------------------------------------- train
    def forward_train(self, img, gt_boxes, gt_labels, gt_masks, gt_valid,
                      rng) -> Dict[str, jax.Array]:
        """gt_boxes (B, G, 4); gt_labels (B, G); gt_masks (B, G, H, W);
        gt_valid (B, G)."""
        B, H, W, _ = img.shape
        feats = self.extract_feats(img, train=True)
        cls_out, reg_out = self.rpn_head(feats)
        lvl_anchors = multi_level_anchors(
            [f.shape[1:3] for f in feats], FPN_STRIDES)
        anchors = jnp.asarray(np.concatenate(lvl_anchors, axis=0))
        r_rpn, r_roi = jax.random.split(rng)
        losses = rpn_loss(cls_out, reg_out, anchors, gt_boxes, gt_valid,
                          r_rpn, (H, W))

        props, p_scores, p_valid = get_proposals(
            cls_out, reg_out, lvl_anchors, (H, W),
            max_per_img=self.num_proposals_train)
        props = jax.lax.stop_gradient(props)

        def per_image(rng_i, feats_i, rois, roi_valid, gtb, gtl, gtm, gtv):
            # append gts as proposals (mmdet add_gt_as_proposals)
            rois = jnp.concatenate([rois, gtb], axis=0)
            roi_valid = jnp.concatenate([roi_valid, gtv], axis=0)
            assigned, _ = max_iou_assign(rois, gtb, gtv, 0.5, 0.5, 0.5,
                                         match_low_quality=False)
            assigned = jnp.where(roi_valid, assigned, -2)
            s = random_sample(rng_i, assigned, self.num_roi_samples, 0.25)
            roi_feats = multi_level_roi_align(feats_i[:4], rois[s.idx], 7,
                                              FPN_STRIDES[:4])
            cls_logits, deltas = self.bbox_head(roi_feats)
            loss_cls, loss_reg, labels = bbox_head_loss(
                cls_logits, deltas, s, rois, gtb, gtl, self.num_classes)
            # mask branch on the sampled rois (positives weighted)
            mask_feats = multi_level_roi_align(feats_i[:4], rois[s.idx], 14,
                                               FPN_STRIDES[:4])
            mask_logits = self.mask_head(mask_feats)
            targets = crop_resize_masks(gtm, rois[s.idx], s.gt_idx, 28)
            loss_mask = mask_head_loss(mask_logits, s, labels, targets)
            return loss_cls, loss_reg, loss_mask

        rngs = jax.random.split(r_roi, B)
        lc, lr, lm = jax.vmap(per_image)(
            rngs, [f for f in feats], props, p_valid, gt_boxes, gt_labels,
            gt_masks, gt_valid)
        losses.update({"loss_cls": lc.mean(), "loss_bbox": lr.mean(),
                       "loss_mask": lm.mean()})
        losses["loss"] = sum(losses.values())
        return losses
