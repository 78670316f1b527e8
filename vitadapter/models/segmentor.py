"""Encoder-decoder segmentor with whole / sliding-window inference.

Parity targets: mmseg `EncoderDecoder` and the reference
`EncoderDecoderMask2Former.slide_inference`
(`segmentation/mmseg_custom/models/segmentors/encoder_decoder_mask2former.py:156-199`):
fixed crop grid, per-crop logits accumulated into a canvas and normalized by a
count map. TPU-first: the crop grid is static, all crops are stacked on the
batch axis and scored in ONE jit call (same compiled shape), and flip-TTA
averages softmax like the reference `inference` (`:220-253`).
"""

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vitadapter.utils.resize import resize_2d


class EncoderDecoder(nn.Module):
    """Backbone + decode head (+ optional auxiliary head).

    __call__ returns stride-1 logits (resized to input resolution); with
    `with_aux=True` (training) also returns the auxiliary logits.
    """

    backbone: nn.Module
    decode_head: nn.Module
    auxiliary_head: Optional[nn.Module] = None
    aux_in_index: int = 2

    def __call__(self, img: jax.Array, train: bool = False,
                 with_aux: bool = False):
        feats = self.backbone(img, train=train)
        logits = self.decode_head(feats, train=train)
        logits = resize_2d(logits.astype(jnp.float32), img.shape[1:3], "bilinear")
        if with_aux and self.auxiliary_head is not None:
            aux = self.auxiliary_head(feats[self.aux_in_index], train=train)
            aux = resize_2d(aux.astype(jnp.float32), img.shape[1:3], "bilinear")
            return logits, aux
        return logits


def _slide_grid(size: int, crop: int, stride: int) -> List[int]:
    """Crop start offsets covering `size` (reference slide_inference grid)."""
    if size <= crop:
        return [0]
    n = (size - crop + stride - 1) // stride + 1
    starts = []
    for i in range(n):
        y1 = min(i * stride, size - crop)
        starts.append(y1)
    return sorted(set(starts))


def slide_inference(
    logits_fn: Callable[[jax.Array], jax.Array],
    img: jax.Array,
    crop_size: Tuple[int, int],
    stride: Tuple[int, int],
    num_classes: int,
) -> jax.Array:
    """Sliding-window logits over an arbitrarily sized image.

    logits_fn maps a (N, ch, cw, 3) crop batch to (N, ch, cw, K) logits.
    Returns (B, H, W, K) count-normalized logits.
    """
    B, H, W, _ = img.shape
    ch, cw = crop_size
    # pad up to crop size if the image is smaller
    Hp, Wp = max(H, ch), max(W, cw)
    if (Hp, Wp) != (H, W):
        img = jnp.pad(img, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    ys = _slide_grid(Hp, ch, stride[0])
    xs = _slide_grid(Wp, cw, stride[1])

    crops = jnp.stack(
        [img[:, y:y + ch, x:x + cw] for y in ys for x in xs], axis=1
    )  # (B, nCrops, ch, cw, 3)
    n_crops = crops.shape[1]
    crops = crops.reshape(B * n_crops, ch, cw, -1)
    logits = logits_fn(crops).reshape(B, n_crops, ch, cw, num_classes)

    preds = jnp.zeros((B, Hp, Wp, num_classes), jnp.float32)
    count = np.zeros((1, Hp, Wp, 1), np.float32)
    k = 0
    for y in ys:
        for x in xs:
            preds = jax.lax.dynamic_update_slice(
                preds,
                jax.lax.dynamic_slice(
                    preds, (0, y, x, 0), (B, ch, cw, num_classes)
                ) + logits[:, k],
                (0, y, x, 0))
            count[:, y:y + ch, x:x + cw] += 1.0
            k += 1
    preds = preds / jnp.asarray(count)
    return preds[:, :H, :W]


def flip_tta(logits_fn: Callable[[jax.Array], jax.Array]):
    """Average class probabilities over horizontal flip (reference `inference`
    flip branch averages softmax outputs)."""

    def fn(img: jax.Array) -> jax.Array:
        p = jax.nn.softmax(logits_fn(img), axis=-1)
        p_f = jax.nn.softmax(logits_fn(img[:, :, ::-1]), axis=-1)[:, :, ::-1]
        return (p + p_f) / 2.0

    return fn


def multi_scale_flip_aug(
    logits_fn: Callable[[jax.Array], jax.Array],
    img: jax.Array,
    num_classes: int,
    ratios: Sequence[float] = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75),
    flip: bool = True,
    size_divisor: int = 32,
    crop_size: Optional[Tuple[int, int]] = None,
    stride: Optional[Tuple[int, int]] = None,
    img_scale: Optional[Tuple[int, int]] = None,
) -> jax.Array:
    """In-jit multi-scale (+flip) TTA over a fixed-size batch (reference
    `EncoderDecoderMask2Former.aug_test:268-285`; ratio list
    `segmentation/test.py:131-136`).

    Ratio anchoring follows mmseg MultiScaleFlipAug mode 2: when `img_scale`
    is given, each ratio scales the img_scale *canvas* and the image is
    keep-ratio fitted into it (then resized to the /32 multiple, as the
    reference test pipelines' ResizeToMultiple does); without `img_scale`
    the ratios multiply the static input size directly (a non-protocol
    fallback for callers with pre-scaled inputs). Matching the reference
    `inference` order, per-aug logits are resized back to the input
    resolution BEFORE softmax/unflip.

    NOTE: the faithful per-image eval protocol (true ori_shape, odd sizes)
    lives in `models/seg_protocol.py` + `train/loop.run_eval`; this helper
    serves in-jit TTA of fixed-shape batches.
    """
    from vitadapter.models.seg_protocol import (rescale_size, to_multiple,
                                                variant_plan)
    from vitadapter.utils.resize import resize_2d

    B, H, W, _ = img.shape
    acc = jnp.zeros((B, H, W, num_classes), jnp.float32)
    for r in ratios:
        if img_scale is not None:
            _, (h, w) = variant_plan(H, W, img_scale, r, size_divisor)
        else:
            h = max(int(round(H * r / size_divisor)) * size_divisor,
                    size_divisor)
            w = max(int(round(W * r / size_divisor)) * size_divisor,
                    size_divisor)
        scaled = resize_2d(img, (h, w), "bilinear")
        variants = [scaled, scaled[:, :, ::-1]] if flip else [scaled]
        for vi, v in enumerate(variants):
            if crop_size is not None and (h > crop_size[0] or w > crop_size[1]):
                logits = slide_inference(logits_fn, v, crop_size,
                                         stride or crop_size, num_classes)
            else:
                logits = logits_fn(v)
            p = resize_2d(logits.astype(jnp.float32), (H, W), "bilinear")
            p = jax.nn.softmax(p, axis=-1)
            if vi == 1:
                p = p[:, :, ::-1]
            acc = acc + p
    return acc / (len(ratios) * (2 if flip else 1))


def cross_entropy_loss(
    logits: jax.Array,          # (B, H, W, K) fp32
    labels: jax.Array,          # (B, H, W) int32
    ignore_index: int = 255,
    class_weight: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean softmax CE over non-ignored pixels (mmseg CrossEntropyLoss parity:
    reduction='mean' with avg_factor = number of valid pixels)."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    if class_weight is not None:
        w = class_weight[safe]
        nll = nll * w
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(valid.sum(), 1)
    return nll.sum() / denom


def segmentation_loss(logits, aux_logits, labels, aux_weight: float = 0.4,
                      ignore_index: int = 255):
    """decode CE + aux_weight * auxiliary CE (reference upernet config)."""
    main = cross_entropy_loss(logits, labels, ignore_index)
    aux = cross_entropy_loss(aux_logits, labels, ignore_index)
    return main + aux_weight * aux, {"loss_decode": main, "loss_aux": aux}
