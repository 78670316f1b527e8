"""GroundingDINO: text-conditioned single-box grounding detector.

Parity target: `GroundingDINO`
(reference `wsdm2023/mmdet_custom/models/detectors/grounding_dino.py:41-263`):
DINO with a Uni-Perceiver multimodal backbone consuming (image, refer ids,
refer mask); single-box prediction is the top-scoring detection; multi-scale
TTA picks one box by score + mean-IoU vote (`aug_test_vote:229-263`).
(The optional auxiliary FPN seg branch supervised by a box-rectangle mask —
reference `:49-60,102-119` — is a training-only regularizer, tracked for a
later round.)
"""

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vitadapter.det.boxes import bbox_overlaps
from vitadapter.det.dino import cdn_queries, dino_dn_loss, dino_matching_loss, DinoTransformer
from vitadapter.det.losses import cxcywh_to_xyxy, xyxy_to_cxcywh
from vitadapter.det.necks import ChannelMapper


class GroundingDINO(nn.Module):
    backbone: nn.Module          # UniPerceiverAdapter
    num_classes: int = 1
    num_queries: int = 100
    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dn_groups: int = 2
    max_dets: int = 100
    with_aux_seg: bool = False   # auxiliary box-rectangle seg branch
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.with_aux_seg:
            self.aux_seg_convs = [
                nn.Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                        name=f"aux_seg_conv_{i}") for i in range(2)
            ] + [nn.Conv(1, (1, 1), dtype=jnp.float32, name="aux_seg_out")]
        self.neck = ChannelMapper(out_channels=self.embed_dim,
                                             num_outs=4, dtype=self.dtype)
        self.transformer = DinoTransformer(
            embed_dim=self.embed_dim, num_heads=self.num_heads,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            ffn_dim=self.ffn_dim, num_queries=self.num_queries,
            num_classes=self.num_classes, dtype=self.dtype)
        self.label_embed = self.param("label_embed",
                                      nn.initializers.normal(1.0),
                                      (self.num_classes, self.embed_dim),
                                      jnp.float32)

    def __call__(self, img: jax.Array, refer: jax.Array,
                 r_mask: Optional[jax.Array] = None, train: bool = False,
                 gt_boxes=None, gt_labels=None, gt_valid=None, rng=None):
        B, H, W, _ = img.shape
        feats = self.backbone(img, refer, r_mask, train=train)
        feats = self.neck(feats[1:] if len(feats) == 4 else feats)
        aux_seg = None
        if self.with_aux_seg:
            x = feats[0]
            for conv in self.aux_seg_convs[:-1]:
                x = nn.relu(conv(x))
            aux_seg = self.aux_seg_convs[-1](x)[..., 0]   # (B, h, w)
        if not train:
            outs = self.transformer(feats)
            return self._decode(outs, (H, W))
        scale = jnp.asarray([W, H, W, H], jnp.float32)
        gt_n = xyxy_to_cxcywh(gt_boxes / scale)
        dn = cdn_queries(rng, gt_labels, gt_n, gt_valid,
                         self.label_embed.astype(self.dtype),
                         self.dn_groups, self.num_classes, self.num_queries)
        outs = self.transformer(feats, dn.queries, dn.refs, dn.attn_mask)
        n_dn = dn.queries.shape[1]
        losses, total = {}, 0.0
        if self.with_aux_seg:
            # box-rectangle dice supervision on the finest neck feature
            # (reference grounding_dino.py:49-60,102-119)
            seg = aux_seg
            h, w = seg.shape[1:3]
            ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * (H / h)
            xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * (W / w)
            inside = ((ys[None, :, None, None] >= gt_boxes[:, None, None, :, 1])
                      & (ys[None, :, None, None] <= gt_boxes[:, None, None, :, 3])
                      & (xs[None, None, :, None] >= gt_boxes[:, None, None, :, 0])
                      & (xs[None, None, :, None] <= gt_boxes[:, None, None, :, 2])
                      & gt_valid[:, None, None, :])
            target = inside.any(-1).astype(jnp.float32)   # (B, h, w)
            p = jax.nn.sigmoid(seg.astype(jnp.float32))
            inter = (p * target).sum((1, 2))
            dice = 1 - (2 * inter + 1) / (p.sum((1, 2)) + target.sum((1, 2)) + 1)
            losses["loss_aux_seg"] = dice.mean()
            total = total + losses["loss_aux_seg"]
        for i, (cls_l, box_l) in enumerate(zip(outs["cls"], outs["boxes"])):
            m = dino_matching_loss(cls_l[:, n_dn:], box_l[:, n_dn:],
                                   gt_labels, gt_n, gt_valid, self.num_classes)
            d = dino_dn_loss(cls_l[:, :n_dn], box_l[:, :n_dn], dn,
                             self.num_classes)
            total = total + sum(m.values()) + sum(d.values())
            prefix = "" if i == len(outs["cls"]) - 1 else f"d{i}."
            losses.update({prefix + k: v for k, v in (m | d).items()})
        enc = dino_matching_loss(outs["enc_cls"], outs["enc_boxes"],
                                 gt_labels, gt_n, gt_valid, self.num_classes)
        total = total + sum(enc.values())
        losses["loss"] = total
        return losses

    def _decode(self, outs, img_hw):
        H, W = img_hw
        cls_l = outs["cls"][-1]
        box_l = outs["boxes"][-1]
        B, Q, K = cls_l.shape
        scores = jax.nn.sigmoid(cls_l).reshape(B, Q * K)
        k = min(self.max_dets, Q * K)
        top_s, top_i = jax.lax.top_k(scores, k)
        q_idx = top_i // K
        boxes = jnp.take_along_axis(box_l, q_idx[..., None], axis=1)
        boxes = cxcywh_to_xyxy(boxes) * jnp.asarray([W, H, W, H], jnp.float32)
        return {"boxes": boxes, "scores": top_s,
                "labels": (top_i % K).astype(jnp.int32)}


def aug_test_vote(per_scale_results: Sequence[Dict[str, np.ndarray]],
                  top_k: int = 100) -> np.ndarray:
    """Single-box TTA: pool top boxes across scales; each box's score is
    boosted by its mean IoU with the others; return the argmax box.

    Reference `grounding_dino.py:229-263` (host-side, numpy).
    """
    boxes = np.concatenate([r["boxes"][:top_k] for r in per_scale_results], 0)
    scores = np.concatenate([r["scores"][:top_k] for r in per_scale_results], 0)
    keep = np.isfinite(scores)
    boxes, scores = boxes[keep], scores[keep]
    if len(boxes) == 0:
        return np.zeros(4, np.float32)
    iou = np.asarray(bbox_overlaps(jnp.asarray(boxes), jnp.asarray(boxes)))
    vote = scores + iou.mean(axis=1)
    return boxes[int(np.argmax(vote))]
