"""Encoder-decoder segmentor with a Mask2Former head.

Parity target: `EncoderDecoderMask2Former`
(reference `segmentation/mmseg_custom/models/segmentors/encoder_decoder_mask2former.py:13-286`).
Inference fuses the final decoder layer's class/mask predictions into
per-class maps (reference `forward_test:557-579`) resized to input
resolution; slide/TTA reuse `models/segmentor.py` helpers unchanged.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitadapter.heads.mask2former import Mask2FormerHead
from vitadapter.utils.resize import resize_2d


class EncoderDecoderMask2Former(nn.Module):
    backbone: nn.Module
    decode_head: Mask2FormerHead

    def __call__(self, img: jax.Array, train: bool = False,
                 return_queries: bool = False):
        feats = self.backbone(img, train=train)
        cls_list, mask_list = self.decode_head(feats, train=train)
        if train:
            return cls_list, mask_list
        if return_queries:
            # raw per-query predictions for panoptic / instance fusion
            # (reference MaskFormerFusionHead input, mmdet
            # `dense_heads/maskformer_fusion_head.py`): cls (B, Q, K+1)
            # logits, masks (B, Q, H, W) logits at input resolution
            masks = resize_2d(mask_list[-1].transpose(0, 2, 3, 1),
                              img.shape[1:3], "bilinear")
            return cls_list[-1], masks.transpose(0, 3, 1, 2)
        seg = Mask2FormerHead.semantic_inference(cls_list[-1], mask_list[-1])
        return resize_2d(seg, img.shape[1:3], "bilinear")
