"""Panoptic / instance post-processing for MaskFormer-family heads.

Parity targets: mmdet `MaskFormerFusionHead.panoptic_postprocess` /
`instance_postprocess` as used by the reference panoptic config
(`detection/configs/mask2former/mask2former_beitv2_adapter_large_16x1_3x_
coco-panoptic.py`), with the reference `INSTANCE_OFFSET` convention
(`segmentation/mmseg_custom/core/evaluation/panoptic_utils.py`).

Static shapes: the query budget is fixed; the output panoptic map encodes
`label * INSTANCE_OFFSET + instance_id` with -1 for void.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

INSTANCE_OFFSET = 1000


def panoptic_fuse(cls_pred: jax.Array, mask_pred: jax.Array,
                  num_things: int, num_stuff: int,
                  object_mask_thr: float = 0.8,
                  iou_thr: float = 0.8,
                  overlap_frac_thr: float = 0.8) -> jax.Array:
    """Fuse per-query predictions into a panoptic id map.

    cls_pred (Q, K+1) logits; mask_pred (Q, H, W) logits.
    Returns (H, W) int32 panoptic map: label * INSTANCE_OFFSET + inst_id,
    or -1 for void.
    """
    K = num_things + num_stuff
    probs = jax.nn.softmax(cls_pred.astype(jnp.float32), axis=-1)
    scores = probs[:, :K].max(-1)
    labels = probs[:, :K].argmax(-1).astype(jnp.int32)
    keep = scores > object_mask_thr

    masks = jax.nn.sigmoid(mask_pred.astype(jnp.float32))
    # per-pixel winning query among kept ones, weighted by class score
    weighted = jnp.where(keep[:, None, None], scores[:, None, None] * masks,
                         -1.0)
    winner = jnp.argmax(weighted, axis=0)  # (H, W)
    has_any = jnp.max(weighted, axis=0) > 0

    # per-query: area where it wins AND its mask fires vs its full mask area
    Q = cls_pred.shape[0]
    win_onehot = jax.nn.one_hot(winner, Q, axis=0, dtype=jnp.float32)
    fired = (masks >= 0.5).astype(jnp.float32)
    win_area = (win_onehot * fired * has_any[None]).sum(axis=(1, 2))
    full_area = fired.sum(axis=(1, 2))
    ok = keep & (full_area > 0) & \
        (win_area / jnp.maximum(full_area, 1.0) > overlap_frac_thr)

    # instance ids: things get unique ids (query index + 1); stuff of the
    # same class share one segment (id 0)
    is_thing = labels < num_things
    inst_id = jnp.where(is_thing, jnp.arange(Q, dtype=jnp.int32) + 1, 0)
    seg_id = labels * INSTANCE_OFFSET + inst_id

    pix_ok = jnp.take(ok, winner)
    pan = jnp.where(has_any & pix_ok, jnp.take(seg_id, winner), -1)
    return pan.astype(jnp.int32)


def instance_postprocess(cls_pred: jax.Array, mask_pred: jax.Array,
                         num_things: int, max_per_image: int = 100
                         ) -> Dict[str, jax.Array]:
    """Top-k (query, class) instance predictions with mask-quality-weighted
    scores (mmdet MaskFormerFusionHead.instance_postprocess)."""
    Q = cls_pred.shape[0]
    probs = jax.nn.softmax(cls_pred.astype(jnp.float32), -1)[:, :num_things]
    flat = probs.reshape(-1)
    k = min(max_per_image, flat.shape[0])
    top_s, top_i = jax.lax.top_k(flat, k)
    q_idx = top_i // num_things
    labels = (top_i % num_things).astype(jnp.int32)
    masks = jax.nn.sigmoid(mask_pred.astype(jnp.float32))[q_idx]
    binary = masks >= 0.5
    # score *= mean mask prob inside the binary mask
    quality = (masks * binary).sum((1, 2)) / jnp.maximum(
        binary.sum((1, 2)), 1)
    return {"labels": labels, "scores": top_s * quality,
            "masks": binary}
