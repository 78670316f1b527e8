"""DINO detector: two-stage deformable transformer + contrastive denoising.

Parity targets (reference `wsdm2023/mmdet_custom/models/`):
  * `DinoTransformer` / `DinoTransformerDecoder`
    (`utils/transformer.py:30,145`): 6-layer deformable encoder over 4
    scales, encoder-output proposal generation, top-k two-stage query init,
    sine embedding of 4-d box references, iterative box refinement.
  * `CdnQueryGenerator` (`utils/query_denoising.py:9,214`): label-flip +
    box-jitter noise groups (positive/negative pairs) with a block attention
    mask isolating groups from each other and from matching queries.
  * `DINOHead` (`dense_heads/dino_head.py:16-380`): focal cls 2.0 +
    L1 5.0 + GIoU 2.0 losses per decoder layer, Hungarian matching with the
    same costs, separate denoising losses.

Static shapes: G_max gts, fixed dn group count, fixed num_queries.
"""

import math
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vitadapter.det.losses import (bbox_l1_cost, cxcywh_to_xyxy, focal_cost,
                                   giou, giou_cost, inverse_sigmoid,
                                   sigmoid_focal_loss, xyxy_to_cxcywh)
from vitadapter.heads.pixel_decoder import DeformableEncoderLayer
from vitadapter.layers.positional import sine_positional_encoding
from vitadapter.ops.matching import hungarian_assign
from vitadapter.ops.msda import MSDeformAttn


def sine_embed_coords(coords: jax.Array, num_feats: int = 128,
                      temperature: float = 10000.0) -> jax.Array:
    """DETR sine embedding of normalized coords (..., n) -> (..., n*num_feats).

    Matches the reference `gen_sineembed_for_position`
    (`wsdm2023/.../utils/transformer.py:46`): scale 2*pi, interleaved
    sin/cos per coordinate.
    """
    scale = 2 * math.pi
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    x = coords.astype(jnp.float32)[..., None] * scale / dim_t
    emb = jnp.stack([jnp.sin(x[..., 0::2]), jnp.cos(x[..., 1::2])], axis=-1)
    emb = emb.reshape(*coords.shape[:-1], coords.shape[-1] * num_feats)
    return emb


class DinoDecoderLayer(nn.Module):
    """self_attn -> LN -> deformable cross_attn -> LN -> FFN -> LN."""

    num_heads: int = 8
    n_levels: int = 4
    n_points: int = 4
    ffn_dim: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, query_pos, memory, spatial_shapes,
                 reference_points, self_attn_mask=None):
        from vitadapter.heads.mask2former import MultiheadAttention

        d = query.shape[-1]
        q = query + query_pos
        sa = MultiheadAttention(self.num_heads, dtype=self.dtype,
                                name="self_attn")(
            q, q, query,
            attn_mask=None if self_attn_mask is None else self_attn_mask)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(query + sa)
        ca = MSDeformAttn(d_model=d, n_levels=self.n_levels,
                          n_heads=self.num_heads, n_points=self.n_points,
                          dtype=self.dtype, name="cross_attn")(
            x + query_pos, reference_points, memory, spatial_shapes)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + ca)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn_fc1")(x)
        y = nn.relu(y)
        y = nn.Dense(d, dtype=self.dtype, name="ffn_fc2")(y)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(x + y)


class DinoTransformer(nn.Module):
    """Two-stage deformable transformer with iterative box refinement."""

    embed_dim: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    n_points: int = 4
    ffn_dim: int = 2048
    num_queries: int = 900
    num_classes: int = 80
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        C = self.embed_dim
        self.level_embed = self.param("level_embed",
                                      nn.initializers.normal(1.0), (4, C),
                                      jnp.float32)
        self.encoder_layers = [
            DeformableEncoderLayer(num_heads=self.num_heads, n_levels=4,
                                   n_points=self.n_points,
                                   ffn_dim=self.ffn_dim, dtype=self.dtype,
                                   name=f"encoder_layer_{i}")
            for i in range(self.num_encoder_layers)
        ]
        self.decoder_layers = [
            DinoDecoderLayer(num_heads=self.num_heads, n_levels=4,
                             n_points=self.n_points, ffn_dim=self.ffn_dim,
                             dtype=self.dtype, name=f"decoder_layer_{i}")
            for i in range(self.num_decoder_layers)
        ]
        self.enc_output = nn.Dense(C, dtype=self.dtype, name="enc_output")
        self.enc_output_norm = nn.LayerNorm(epsilon=1e-5, name="enc_output_norm")
        # shared prediction branches (one per decoder layer + encoder)
        n_pred = self.num_decoder_layers + 1
        self.cls_branches = [nn.Dense(self.num_classes, name=f"cls_branch_{i}")
                             for i in range(n_pred)]
        self.reg_branches = [
            [nn.Dense(self.embed_dim, dtype=self.dtype,
                      name=f"reg_branch_{i}_fc{j}") for j in range(2)]
            + [nn.Dense(4, name=f"reg_branch_{i}_out")]
            for i in range(n_pred)
        ]
        self.query_embed = self.param("query_embed",
                                      nn.initializers.normal(1.0),
                                      (self.num_queries, C), jnp.float32)
        self.ref_point_head = [
            nn.Dense(C, dtype=self.dtype, name="ref_point_fc1"),
            nn.Dense(C, dtype=self.dtype, name="ref_point_fc2")]
        # final decoder norm: reference DinoTransformerDecoder.norm — the
        # head's cls/reg predictions run on NORMED layer outputs while the
        # internal box refinement runs on the raw outputs (`transformer.py:
        # 43,131`)
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")

    def _reg(self, i, x):
        for fc in self.reg_branches[i][:-1]:
            x = nn.relu(fc(x))
        return self.reg_branches[i][-1](x).astype(jnp.float32)

    def _query_pos(self, refs):
        """4-d reference -> positional query via sine embed + MLP.

        The reference embeds blocks in (y, x, w, h) order
        (`gen_sineembed_for_position`, `transformer.py:46-80`)."""
        emb = sine_embed_coords(refs[..., jnp.array([1, 0, 2, 3])],
                                self.embed_dim // 2)
        x = nn.relu(self.ref_point_head[0](emb.astype(self.dtype)))
        return self.ref_point_head[1](x)

    def __call__(self, feats: Sequence[jax.Array],
                 dn_queries: Optional[jax.Array] = None,
                 dn_refs: Optional[jax.Array] = None,
                 dn_attn_mask: Optional[jax.Array] = None):
        """feats: 4-scale NHWC. Returns dict with per-layer predictions."""
        B = feats[0].shape[0]
        C = self.embed_dim
        tokens, pos, shapes, ref_pts, proposals = [], [], [], [], []
        for i, f in enumerate(feats):
            H, W = f.shape[1], f.shape[2]
            tokens.append(f.reshape(B, H * W, C))
            p = sine_positional_encoding((H, W), C // 2)
            pos.append((p.reshape(1, H * W, C) + self.level_embed[i]
                        ).astype(f.dtype) * jnp.ones((B, 1, 1), f.dtype))
            shapes.append((H, W))
            ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
            xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
            yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
            grid = jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1)
            ref_pts.append(grid)
            wh = jnp.full_like(grid, 0.05 * (2.0 ** i))
            proposals.append(jnp.concatenate([grid, wh], -1))

        memory = jnp.concatenate(tokens, axis=1)
        pos_all = jnp.concatenate(pos, axis=1)
        spatial_shapes = tuple(shapes)
        ref = jnp.concatenate(ref_pts, axis=0)[None, :, None, :]
        ref = jnp.broadcast_to(ref, (B, ref.shape[1], 4, 2))
        for layer in self.encoder_layers:
            memory = layer(memory, pos_all, ref, spatial_shapes)

        # --- two-stage proposal generation (gen_encoder_output_proposals,
        # reference `transformer.py:688-753`): proposals in inverse-sigmoid
        # space; positions whose proposal leaves (0.01, 0.99) on any coord
        # are masked to +inf and their memory zeroed before enc_output ---
        props = jnp.concatenate(proposals, axis=0)[None]  # (1, S, 4)
        valid = jnp.all((props > 0.01) & (props < 0.99), axis=-1,
                        keepdims=True)  # trace-time constant
        props_unact = jnp.where(valid, jnp.log(props / (1 - props)), jnp.inf)
        mem_in = jnp.where(valid, memory, 0)
        out_memory = self.enc_output_norm(self.enc_output(mem_in))
        enc_cls = self.cls_branches[-1](out_memory).astype(jnp.float32)
        enc_delta = self._reg(self.num_decoder_layers, out_memory)
        enc_boxes = jax.nn.sigmoid(enc_delta + props_unact)
        top_scores = enc_cls.max(-1)  # (B, S)
        _, top_idx = jax.lax.top_k(top_scores, self.num_queries)
        refs = jnp.take_along_axis(enc_boxes, top_idx[..., None], axis=1)
        refs = jax.lax.stop_gradient(refs)
        enc_cls_top = jnp.take_along_axis(enc_cls, top_idx[..., None], axis=1)
        enc_box_top = jnp.take_along_axis(enc_boxes, top_idx[..., None],
                                          axis=1)

        query = jnp.broadcast_to(self.query_embed[None].astype(memory.dtype),
                                 (B, self.num_queries, C))
        attn_mask = None
        if dn_queries is not None:
            query = jnp.concatenate([dn_queries, query], axis=1)
            refs = jnp.concatenate([dn_refs, refs], axis=1)
            attn_mask = dn_attn_mask  # (Q_total, Q_total) bool True=masked
            attn_mask = jnp.broadcast_to(
                attn_mask[None, None], (B, self.num_heads) + attn_mask.shape)

        # decoder: predictions run on NORMED outputs with look-forward-twice
        # reference bases (layer i's head base = refs entering layer i;
        # un-detached for i >= 1 so the box grad reaches layer i-1's
        # refinement — reference `transformer.py:125-136`,
        # `dino_head.py:111-124`); the internal sampling refinement runs on
        # the RAW outputs and is detached for the next layer.
        cls_list, box_list = [], []
        base = refs
        for i, layer in enumerate(self.decoder_layers):
            qpos = self._query_pos(refs)
            query = layer(query, qpos, memory, spatial_shapes, refs[:, :, None, :]
                          * jnp.ones((1, 1, 4, 1)), self_attn_mask=attn_mask)
            normed = self.decoder_norm(query)
            cls_list.append(self.cls_branches[i](normed).astype(jnp.float32))
            box_list.append(jax.nn.sigmoid(
                self._reg(i, normed) + inverse_sigmoid(base, eps=1e-3)))
            new_refs = jax.nn.sigmoid(
                self._reg(i, query) + inverse_sigmoid(refs, eps=1e-3))
            base = new_refs
            refs = jax.lax.stop_gradient(new_refs)

        return {"cls": cls_list, "boxes": box_list,
                "enc_cls": enc_cls_top, "enc_boxes": enc_box_top}


class DnQueries(NamedTuple):
    queries: jax.Array     # (B, n_dn, C)
    refs: jax.Array        # (B, n_dn, 4) cxcywh
    attn_mask: jax.Array   # (n_total, n_total) bool True = masked
    labels: jax.Array      # (B, n_dn) target labels (num_classes = negative)
    boxes: jax.Array       # (B, n_dn, 4) target boxes (cxcywh)
    valid: jax.Array       # (B, n_dn) contributes to loss
    is_pos: jax.Array      # (B, n_dn) positive (box-reconstructing) queries


def cdn_queries(rng: jax.Array, gt_labels: jax.Array, gt_boxes: jax.Array,
                gt_valid: jax.Array, label_embed: jax.Array,
                num_groups: int, num_classes: int, num_matching: int,
                label_noise: float = 0.5, box_noise: float = 1.0) -> DnQueries:
    """Contrastive denoising queries (reference `CdnQueryGenerator`).

    Each group holds G_max positive + G_max negative noised copies of the
    gts; positives jitter within the box, negatives jitter between 1x and 2x
    the box extent and are trained as background.
    """
    B, G = gt_labels.shape
    n_dn = 2 * G * num_groups
    r_lbl, r_sign, r_box = jax.random.split(rng, 3)

    labels = jnp.tile(gt_labels, (1, 2 * num_groups))
    boxes = jnp.tile(gt_boxes, (1, 2 * num_groups, 1))
    valid = jnp.tile(gt_valid, (1, 2 * num_groups))
    # positive = first half of each group pair
    is_pos = jnp.tile(
        jnp.concatenate([jnp.ones(G, bool), jnp.zeros(G, bool)]),
        (num_groups,))[None].repeat(B, 0)

    # label flipping
    flip = jax.random.uniform(r_lbl, (B, n_dn)) < (label_noise * 0.5)
    rand_lbl = jax.random.randint(r_lbl, (B, n_dn), 0, num_classes)
    noisy_labels = jnp.where(flip, rand_lbl, labels)
    # box jitter: pos within +-wh/2 * box_noise, neg (1, 2) * wh/2 * box_noise
    wh = boxes[..., 2:]
    diff = jnp.concatenate([wh / 2, wh / 2], -1)
    sign = jnp.where(jax.random.uniform(r_sign, boxes.shape) > 0.5, 1.0, -1.0)
    u = jax.random.uniform(r_box, boxes.shape)
    mag = jnp.where(is_pos[..., None], u, 1.0 + u)
    noisy = cxcywh_to_xyxy(boxes) + sign * mag * diff * box_noise
    noisy = jnp.clip(noisy, 0.0, 1.0)
    noisy_boxes = xyxy_to_cxcywh(noisy)
    # independent corner jitter can invert a box (negative extent); the
    # reference feeds it through inverse_sigmoid(eps=1e-3) + sigmoid, which
    # is a clamp to [1e-3, 1-1e-3] (`query_denoising.py:156-162`,
    # `transformer.py:258-259`)
    noisy_boxes = jnp.clip(noisy_boxes, 1e-3, 1 - 1e-3)

    queries = label_embed[noisy_labels]

    n_total = n_dn + num_matching
    mask = jnp.zeros((n_total, n_total), bool)
    # matching queries never see dn queries
    mask = mask.at[n_dn:, :n_dn].set(True)
    # dn groups are mutually isolated
    gidx = jnp.arange(n_dn) // (2 * G)
    diff_group = gidx[:, None] != gidx[None, :]
    mask = mask.at[:n_dn, :n_dn].set(diff_group)

    tgt_labels = jnp.where(is_pos, labels, num_classes)
    return DnQueries(queries, noisy_boxes, mask, tgt_labels, boxes,
                     valid, is_pos & valid)


def dino_matching_loss(cls_logits, pred_boxes, gt_labels, gt_boxes_n,
                       gt_valid, num_classes: int,
                       w_cls: float = 2.0, w_l1: float = 5.0,
                       w_iou: float = 2.0):
    """Hungarian-matched focal + L1 + GIoU for one decoder layer.

    pred_boxes / gt_boxes_n: normalized cxcywh.
    """
    B, Q, K = cls_logits.shape

    def per_image(cls_l, pb, gl, gb, gv):
        c = focal_cost(cls_l, gl, w_cls)
        c += bbox_l1_cost(pb, gb, w_l1)
        c += giou_cost(cxcywh_to_xyxy(pb), cxcywh_to_xyxy(gb), w_iou)
        return c

    cost = jax.vmap(per_image)(cls_logits, pred_boxes, gt_labels,
                               gt_boxes_n, gt_valid)
    cost = jax.lax.stop_gradient(cost)
    assign = hungarian_assign(cost, gt_valid.sum(-1).astype(jnp.int32))
    pos = assign >= 0
    safe = jnp.maximum(assign, 0)
    labels = jnp.where(pos, jnp.take_along_axis(gt_labels, safe, 1),
                       num_classes)
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    loss_cls = sigmoid_focal_loss(cls_logits.astype(jnp.float32),
                                  onehot).sum() / num_pos * w_cls

    tgt_boxes = jnp.take_along_axis(gt_boxes_n, safe[..., None], 1)
    l1 = jnp.abs(pred_boxes - tgt_boxes).sum(-1)
    loss_bbox = jnp.where(pos, l1, 0.0).sum() / num_pos * w_l1
    g = giou(cxcywh_to_xyxy(pred_boxes), cxcywh_to_xyxy(tgt_boxes))
    loss_iou = jnp.where(pos, 1 - g, 0.0).sum() / num_pos * w_iou
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
            "loss_iou": loss_iou}


def dino_dn_loss(cls_logits, pred_boxes, dn: DnQueries, num_classes: int,
                 w_cls: float = 2.0, w_l1: float = 5.0, w_iou: float = 2.0):
    """Denoising losses: fixed assignment (each dn query reconstructs its gt)."""
    num_pos = jnp.maximum(dn.is_pos.sum().astype(jnp.float32), 1.0)
    onehot = jax.nn.one_hot(jnp.where(dn.valid, dn.labels, num_classes),
                            num_classes, dtype=jnp.float32)
    fl = sigmoid_focal_loss(cls_logits.astype(jnp.float32), onehot)
    loss_cls = jnp.where(dn.valid[..., None], fl, 0.0).sum() / num_pos * w_cls
    l1 = jnp.abs(pred_boxes - dn.boxes).sum(-1)
    loss_bbox = jnp.where(dn.is_pos, l1, 0.0).sum() / num_pos * w_l1
    g = giou(cxcywh_to_xyxy(pred_boxes), cxcywh_to_xyxy(dn.boxes))
    loss_iou = jnp.where(dn.is_pos, 1 - g, 0.0).sum() / num_pos * w_iou
    return {"loss_cls_dn": loss_cls, "loss_bbox_dn": loss_bbox,
            "loss_iou_dn": loss_iou}
