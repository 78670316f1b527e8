"""Segmentation metrics: streaming confusion matrix -> mIoU / aAcc / mAcc.

Parity target: mmseg `eval_metrics` (`mIoU` as pinned by
`segmentation/README.md:105-114`). The confusion matrix is a device-side
one-hot matmul reduction — under a data mesh the per-batch matrices combine
with a `psum`-style sum, replacing the reference's gather-to-rank0 path.
"""

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(pred: jax.Array, label: jax.Array, num_classes: int,
                     ignore_index: int = 255) -> jax.Array:
    """(num_classes, num_classes) counts[gt, pred] over valid pixels."""
    valid = label != ignore_index
    gt = jnp.where(valid, label, 0).astype(jnp.int32)
    pr = pred.astype(jnp.int32)
    idx = gt * num_classes + pr
    flat = jnp.where(valid, idx, num_classes * num_classes)
    counts = jnp.zeros(num_classes * num_classes + 1, jnp.int32).at[
        flat.reshape(-1)].add(1)
    return counts[:-1].reshape(num_classes, num_classes)


def miou_from_confusion(cm: np.ndarray):
    """Returns dict with aAcc, mIoU, mAcc (NaN classes excluded, as mmseg)."""
    cm = np.asarray(cm, np.float64)
    tp = np.diag(cm)
    gt = cm.sum(1)
    pr = cm.sum(0)
    union = gt + pr - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = tp / union
        acc = tp / gt
    present = gt > 0
    return {
        "aAcc": float(tp.sum() / max(cm.sum(), 1)),
        "mIoU": float(np.nanmean(np.where(present, iou, np.nan))),
        "mAcc": float(np.nanmean(np.where(present, acc, np.nan))),
    }
