"""Mask utilities (reference `segmentation/mmseg_custom/core/mask/utils.py`).

`encode_mask_results` -> COCO RLE dicts (via the pure-python codec in
`data/coco.py`); `mask2bbox` -> tight xyxy boxes from binary masks.
"""

from typing import Dict, List, Sequence

import numpy as np

from vitadapter.data.coco import encode_rle


def mask2bbox(masks: np.ndarray) -> np.ndarray:
    """(N, H, W) binary masks -> (N, 4) xyxy boxes (zeros for empty masks)."""
    N = masks.shape[0]
    out = np.zeros((N, 4), np.float32)
    for i, m in enumerate(np.asarray(masks, bool)):
        ys, xs = np.nonzero(m)
        if len(ys):
            out[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    return out


def encode_mask_results(masks: Sequence[np.ndarray]) -> List[Dict]:
    """Binary masks -> list of COCO compressed RLE dicts (reference
    `encode_mask_results`, used for result dumps/submissions)."""
    return [encode_rle(np.asarray(m, np.uint8)) for m in masks]


def scale_range_filter(boxes: np.ndarray, short_edge: int,
                       version: str = "v1") -> np.ndarray:
    """Scale-aware gt filter used during multi-scale TTA training
    (reference `wsdm2023/.../detr_head.py:_get_area_thr:477-545`): keep gts
    whose sqrt-area matches the image's training scale bucket.

    Returns a boolean keep mask.
    """
    s = np.sqrt(np.clip((boxes[:, 2] - boxes[:, 0])
                        * (boxes[:, 3] - boxes[:, 1]), 0, None))
    # v1 gates: small scales train small boxes, large scales train large
    buckets = {
        "v1": [(0, 480, 0, 1e9), (480, 800, 32, 1e9), (800, 1e9, 64, 1e9)],
        "v2": [(0, 480, 0, 256), (480, 800, 32, 512), (800, 1e9, 64, 1e9)],
    }[version]
    keep = np.ones(len(boxes), bool)
    for lo, hi, smin, smax in buckets:
        if lo <= short_edge < hi:
            keep = (s >= smin) & (s < smax)
            break
    return keep
