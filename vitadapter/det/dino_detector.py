"""DINO detector model: backbone -> ChannelMapper -> DinoTransformer.

Parity target: the reference wsdm2023 DINO config
(`dino_4scale_uniperceiver_adapter_large_24ep_gqa_wsdm2023.py`): 4-scale
features (strides 8/16/32/64 via ChannelMapper), 6+6 transformer,
CDN query denoising, focal+L1+GIoU losses on every decoder layer plus the
encoder proposals. Inference: flat top-k over sigmoid class scores
(mmdet DETRHead._get_bboxes_single).
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitadapter.det.dino import (DnQueries, cdn_queries, dino_dn_loss,
                                 dino_matching_loss, DinoTransformer)
from vitadapter.det.losses import cxcywh_to_xyxy, xyxy_to_cxcywh
from vitadapter.det.necks import ChannelMapper


class DINO(nn.Module):
    backbone: nn.Module
    num_classes: int = 80
    num_queries: int = 900
    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dn_groups: int = 2
    max_dets: int = 100
    dtype: jnp.dtype = jnp.float32

    def setup(self):
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

    def extract(self, img, train):
        feats = self.backbone(img, train=train)
        # strides 8/16/32 (+ pooled 64)
        return self.neck(feats[1:])

    def __call__(self, img: jax.Array, train: bool = False,
                 gt_boxes: Optional[jax.Array] = None,
                 gt_labels: Optional[jax.Array] = None,
                 gt_valid: Optional[jax.Array] = None,
                 rng: Optional[jax.Array] = None):
        B, H, W, _ = img.shape
        feats = self.extract(img, train)
        if not train:
            outs = self.transformer(feats)
            return self._decode(outs, (H, W))

        # normalized cxcywh gts
        scale = jnp.asarray([W, H, W, H], jnp.float32)
        gt_n = xyxy_to_cxcywh(gt_boxes / scale)
        dn = cdn_queries(rng, gt_labels, gt_n, gt_valid,
                         self.label_embed.astype(self.dtype),
                         self.dn_groups, self.num_classes, self.num_queries)
        outs = self.transformer(feats, dn.queries, dn.refs, dn.attn_mask)
        n_dn = dn.queries.shape[1]

        losses: Dict[str, jax.Array] = {}
        total = 0.0
        for i, (cls_l, box_l) in enumerate(zip(outs["cls"], outs["boxes"])):
            m = dino_matching_loss(cls_l[:, n_dn:], box_l[:, n_dn:],
                                   gt_labels, gt_n, gt_valid,
                                   self.num_classes)
            d = dino_dn_loss(cls_l[:, :n_dn], box_l[:, :n_dn], dn,
                             self.num_classes)
            layer_loss = sum(m.values()) + sum(d.values())
            total = total + layer_loss
            prefix = "" if i == len(outs["cls"]) - 1 else f"d{i}."
            losses.update({prefix + k: v for k, v in (m | d).items()})
        enc = dino_matching_loss(outs["enc_cls"], outs["enc_boxes"],
                                 gt_labels, gt_n, gt_valid, self.num_classes)
        total = total + sum(enc.values())
        losses.update({"enc." + k: v for k, v in enc.items()})
        losses["loss"] = total
        return losses

    def _decode(self, outs, img_hw):
        H, W = img_hw
        cls_l = outs["cls"][-1]          # (B, Q, K)
        box_l = outs["boxes"][-1]        # (B, Q, 4) normalized cxcywh
        B, Q, K = cls_l.shape
        scores = jax.nn.sigmoid(cls_l).reshape(B, Q * K)
        k = min(self.max_dets, Q * K)
        top_s, top_i = jax.lax.top_k(scores, k)
        q_idx = top_i // K
        labels = (top_i % K).astype(jnp.int32)
        boxes = jnp.take_along_axis(box_l, q_idx[..., None], axis=1)
        boxes = cxcywh_to_xyxy(boxes) * jnp.asarray([W, H, W, H], jnp.float32)
        return {"boxes": boxes, "scores": top_s, "labels": labels}
