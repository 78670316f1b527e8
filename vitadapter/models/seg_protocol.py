"""The mmseg test-time protocol, TPU-first.

Reference contract (every published seg mIoU row was measured under it):
  1. keep-ratio resize of the raw image to the test `img_scale` canvas
     (`segmentation/configs/_base_/datasets/ade20k.py:23-27`; under
     `--aug-test` the canvas is `img_scale * ratio` per
     `segmentation/test.py:131-136` + mmseg MultiScaleFlipAug mode 2),
  2. `ResizeToMultiple(size_divisor=32)` — a second resize, not a pad
     (every ViT-Adapter seg config's test_pipeline, e.g.
     `configs/ade20k/mask2former_beit_adapter_large_896_80k_ade20k_ss.py`),
  3. optional horizontal flip, normalize,
  4. slide/whole inference at that scale
     (`encoder_decoder_mask2former.py:156-219`),
  5. bilinear resize of the count-normalized logits back to `ori_shape`,
     THEN softmax, THEN unflip (`inference`, `:220-253`),
  6. average the per-aug probability maps, argmax (`aug_test:268-285`).

TPU-first design: per-image `ori_shape` varies, but resizing with the
matrix-contraction formulation (`utils/resize.resize_matrix`) lets the true
sizes live in host-built (bucket-padded) interpolation matrices passed as
*data* — so one compiled assembly program serves every image that shares the
(scaled-shape, ori-bucket) signature, and the unflip folds into the column
matrix as a row reversal. Crop scoring runs in fixed-shape chunks through a
single compiled model call, sharded over the data mesh.
"""

import math
from typing import List, Sequence, Tuple

import numpy as np

from vitadapter.utils.resize import resize_matrix


def rescale_size(h: int, w: int, scale: Tuple[int, int]) -> Tuple[int, int]:
    """mmcv.rescale_size parity: fit (h, w) inside (long, short) keep-ratio.

    scale_factor = min(max(scale)/max(h,w), min(scale)/min(h,w)); new size
    rounds each dim with int(x * f + 0.5) (mmcv `_scale_size`).
    """
    max_long, max_short = max(scale), min(scale)
    f = min(max_long / max(h, w), max_short / min(h, w))
    return int(h * f + 0.5), int(w * f + 0.5)


def to_multiple(h: int, w: int, divisor: int = 32) -> Tuple[int, int]:
    """mmcv.imresize_to_multiple target size (ceil to the divisor)."""
    return (int(math.ceil(h / divisor)) * divisor,
            int(math.ceil(w / divisor)) * divisor)


def variant_plan(ho: int, wo: int, img_scale: Tuple[int, int], ratio: float,
                 divisor: int = 32):
    """Per-(image, ratio) shapes: canvas -> keep-ratio (h1,w1) -> /32 (h2,w2).

    MultiScaleFlipAug mode 2 truncates each canvas component with int()
    (mmseg test_time_aug.py: `(int(s[0]*r), int(s[1]*r))`).
    """
    canvas = (int(img_scale[0] * ratio), int(img_scale[1] * ratio))
    h1, w1 = rescale_size(ho, wo, canvas)
    h2, w2 = to_multiple(h1, w1, divisor)
    return (h1, w1), (h2, w2)


def resize_np(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Host-side exact-bilinear (H, W, C) resize via the same interpolation
    matrices the device path uses (torch F.interpolate align_corners=False
    semantics; matches mmcv/cv2 INTER_LINEAR half-pixel convention)."""
    h, w = img.shape[:2]
    ho, wo = out_hw
    if (h, w) == (ho, wo):
        return np.asarray(img, np.float32)
    mh = resize_matrix(h, ho)
    mw = resize_matrix(w, wo)
    out = np.einsum("oh,hwc->owc", mh, np.asarray(img, np.float32))
    return np.einsum("ow,hwc->hoc", mw, out)


def prepare_variant_image(img: np.ndarray, h1w1: Tuple[int, int],
                          h2w2: Tuple[int, int], flip: bool) -> np.ndarray:
    """Steps 1-3 of the protocol on the host: two successive resizes (the
    reference applies Resize then ResizeToMultiple as separate bilinear
    passes — NOT one direct resize) then the horizontal flip."""
    x = resize_np(img, h1w1)
    x = resize_np(x, h2w2)
    if flip:
        x = x[:, ::-1]
    return np.ascontiguousarray(x, np.float32)


def slide_grid(size: int, crop: int, stride: int) -> List[int]:
    """Reference slide start offsets (`slide_inference:156-199`): i*stride
    clamped so the window ends inside the image; windows never read padding."""
    if size <= crop:
        return [0]
    n = (size - crop + stride - 1) // stride + 1
    return sorted({min(i * stride, size - crop) for i in range(n)})


def slide_plan(h2: int, w2: int, crop: Tuple[int, int],
               stride: Tuple[int, int]):
    """(effective crop, y-starts, x-starts). When the scaled image is smaller
    than the crop in a dim, the reference scores the small patch directly
    ('If h_crop > h_img, the small patch will be used') — the effective crop
    clamps to the image."""
    ce = (min(crop[0], h2), min(crop[1], w2))
    ys = slide_grid(h2, ce[0], stride[0])
    xs = slide_grid(w2, ce[1], stride[1])
    return ce, tuple(ys), tuple(xs)


def count_map(h2: int, w2: int, ce: Tuple[int, int], ys: Sequence[int],
              xs: Sequence[int]) -> np.ndarray:
    """Static count_mat of the slide grid (reference normalizes the summed
    crop logits by per-pixel window counts before the ori resize)."""
    cnt = np.zeros((h2, w2, 1), np.float32)
    for y in ys:
        for x in xs:
            cnt[y:y + ce[0], x:x + ce[1]] += 1.0
    assert (cnt > 0).all()
    return cnt


def ori_matrices(h2: int, w2: int, ho: int, wo: int, hob: int, wob: int,
                 flip: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Bucket-padded (hob, h2)/(wob, w2) interpolation matrices resizing the
    scaled-canvas logits to the true ori_shape (rows >= ho/wo are zero — the
    padded region of the ori bucket stays masked by 255 labels). A flipped
    variant is un-flipped by reversing the first `wo` rows of the column
    matrix."""
    mh = np.zeros((hob, h2), np.float32)
    mh[:ho] = resize_matrix(h2, ho)
    mw = np.zeros((wob, w2), np.float32)
    rm = resize_matrix(w2, wo)
    mw[:wo] = rm[::-1] if flip else rm
    return mh, mw


def extract_crops(x: np.ndarray, ce: Tuple[int, int], ys: Sequence[int],
                  xs: Sequence[int]) -> np.ndarray:
    """All slide windows of one scaled image, crop-major: (n_y*n_x, ch, cw, C)."""
    return np.stack([x[y:y + ce[0], x0:x0 + ce[1]] for y in ys for x0 in xs])
