"""Sparse R-CNN: learnable proposals + iterative DynamicConv heads.

Parity targets: mmdet `SparseRCNN`/`DIIHead` as used by the reference config
collection (`detection/configs/sparse_rcnn/`), and `DynamicConv` (reference
`segmentation/mmseg_custom/models/utils/transformer.py:980`): each proposal
feature generates per-instance 1x1 conv params applied to its 7x7 RoI
features; 6 iterative stages refine boxes; set-prediction losses (focal 2.0 +
L1 5.0 + GIoU 2.0) with Hungarian matching per stage.
"""

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vitadapter.det.boxes import RCNN_STDS, delta2bbox
from vitadapter.det.dino import dino_matching_loss
from vitadapter.det.losses import cxcywh_to_xyxy, xyxy_to_cxcywh
from vitadapter.det.necks import FPN
from vitadapter.det.roi_align import multi_level_roi_align

FPN_STRIDES = (4, 8, 16, 32)


class DynamicConv(nn.Module):
    """Per-instance dynamic interaction (reference `transformer.py:980`)."""

    channels: int = 256
    inner: int = 64
    out_flat: int = 256
    roi_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jax.Array, prop_feats: jax.Array):
        """roi_feats (N, 49, C); prop_feats (N, C) -> (N, out_flat)."""
        N = roi_feats.shape[0]
        C, I = self.channels, self.inner
        params = nn.Dense(C * I * 2, dtype=self.dtype,
                          name="dynamic_layer")(prop_feats)
        p1 = params[:, :C * I].reshape(N, C, I)
        p2 = params[:, C * I:].reshape(N, I, C)
        x = jnp.einsum("nsc,nci->nsi", roi_feats, p1)
        x = nn.relu(nn.LayerNorm(epsilon=1e-5, name="norm1")(x))
        x = jnp.einsum("nsi,nic->nsc", x, p2)
        x = nn.relu(nn.LayerNorm(epsilon=1e-5, name="norm2")(x))
        x = x.reshape(N, -1)
        x = nn.Dense(self.out_flat, dtype=self.dtype, name="fc_out")(x)
        return nn.relu(nn.LayerNorm(epsilon=1e-5, name="norm3")(x))


class DIIHead(nn.Module):
    """Dynamic instance interaction head (one refinement stage)."""

    num_classes: int = 80
    channels: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jax.Array, prop_feats: jax.Array):
        """roi_feats (B, N, 49, C); prop_feats (B, N, C)."""
        from vitadapter.heads.mask2former import MultiheadAttention

        B, N, S, C = roi_feats.shape
        x = prop_feats
        sa = MultiheadAttention(self.num_heads, dtype=self.dtype,
                                name="self_attn")(x, x, x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm_attn")(x + sa)
        dyn = DynamicConv(channels=C, out_flat=C, dtype=self.dtype,
                          name="dynamic_conv")
        inter = jax.vmap(dyn)(roi_feats, x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm_inter")(x + inter)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn_fc1")(x)
        y = nn.Dense(C, dtype=self.dtype, name="ffn_fc2")(nn.relu(y))
        x = nn.LayerNorm(epsilon=1e-5, name="norm_ffn")(x + y)
        # mmdet DIIHead towers: 1 cls fc / 3 reg fcs, each
        # Linear(bias=False) + LN + ReLU
        c = x
        for i in range(1):
            c = nn.Dense(C, use_bias=False, dtype=self.dtype,
                         name=f"cls_fc_{i}")(c)
            c = nn.relu(nn.LayerNorm(epsilon=1e-5, name=f"cls_ln_{i}")(c))
        cls = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc_cls")(c)
        r = x
        for i in range(3):
            r = nn.Dense(C, use_bias=False, dtype=self.dtype,
                         name=f"reg_fc_{i}")(r)
            r = nn.relu(nn.LayerNorm(epsilon=1e-5, name=f"reg_ln_{i}")(r))
        delta = nn.Dense(4, dtype=jnp.float32, name="fc_reg")(r)
        return cls, delta, x


class SparseRCNN(nn.Module):
    backbone: nn.Module
    num_classes: int = 80
    num_proposals: int = 100
    num_stages: int = 6
    channels: int = 256
    max_dets: int = 100
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.neck = FPN(out_channels=self.channels, num_outs=4,
                        dtype=self.dtype)
        # proposal boxes init: whole-image boxes (normalized cxcywh)
        self.init_boxes = self.param(
            "init_proposal_boxes",
            lambda k, s: jnp.tile(jnp.asarray([0.5, 0.5, 1.0, 1.0]),
                                  (self.num_proposals, 1)),
            (self.num_proposals, 4))
        self.init_feats = self.param("init_proposal_features",
                                     nn.initializers.normal(1.0),
                                     (self.num_proposals, self.channels),
                                     jnp.float32)
        self.heads = [DIIHead(num_classes=self.num_classes,
                              channels=self.channels, dtype=self.dtype,
                              name=f"stage_{i}")
                      for i in range(self.num_stages)]

    def __call__(self, img, train: bool = False, gt_boxes=None,
                 gt_labels=None, gt_valid=None, rng=None):
        B, H, W, _ = img.shape
        feats = self.neck(self.backbone(img, train=train))
        scale = jnp.asarray([W, H, W, H], jnp.float32)
        boxes = cxcywh_to_xyxy(self.init_boxes)[None] * scale
        boxes = jnp.broadcast_to(boxes, (B, self.num_proposals, 4))
        prop = jnp.broadcast_to(self.init_feats[None].astype(self.dtype),
                                (B, self.num_proposals, self.channels))

        all_cls, all_boxes = [], []
        for head in self.heads:
            def roi(feats_i, boxes_i):
                rf = multi_level_roi_align(feats_i, boxes_i, 7, FPN_STRIDES)
                return rf.reshape(boxes_i.shape[0], 49, -1)
            roi_feats = jax.vmap(roi)([f for f in feats], boxes)
            cls, delta, prop = head(roi_feats, prop)
            boxes = delta2bbox(boxes, delta, (0.5, 0.5, 1.0, 1.0), (H, W))
            all_cls.append(cls)
            all_boxes.append(boxes)
            boxes = jax.lax.stop_gradient(boxes)

        if not train:
            cls = all_cls[-1]
            K = self.num_classes
            scores = jax.nn.sigmoid(cls).reshape(B, -1)
            k = min(self.max_dets, scores.shape[1])
            top_s, top_i = jax.lax.top_k(scores, k)
            p_idx = top_i // K
            labels = (top_i % K).astype(jnp.int32)
            out_boxes = jnp.take_along_axis(all_boxes[-1], p_idx[..., None],
                                            axis=1)
            return {"boxes": out_boxes, "scores": top_s, "labels": labels}

        gt_n = xyxy_to_cxcywh(gt_boxes / scale)
        losses, total = {}, 0.0
        for i, (cls, bx) in enumerate(zip(all_cls, all_boxes)):
            bx_n = xyxy_to_cxcywh(bx / scale)
            m = dino_matching_loss(cls, bx_n, gt_labels, gt_n, gt_valid,
                                   self.num_classes)
            total = total + sum(m.values())
            prefix = "" if i == self.num_stages - 1 else f"s{i}."
            losses.update({prefix + k: v for k, v in m.items()})
        losses["loss"] = total
        return losses
