"""PQ evaluator analytic cases."""

import numpy as np

from vitadapter.det.panoptic_eval import PQEvaluator
from vitadapter.heads.panoptic import INSTANCE_OFFSET


def _pan(arr):
    return np.asarray(arr, np.int64)


def test_perfect_prediction_pq1():
    gt = np.zeros((10, 10), np.int64)
    gt[:, :5] = 0 * INSTANCE_OFFSET + 1   # thing class 0, inst 1
    gt[:, 5:] = 2 * INSTANCE_OFFSET       # stuff class 2
    ev = PQEvaluator(num_things=2, num_stuff=1)
    ev.add_image(gt.copy(), gt)
    s = ev.summarize()
    assert abs(s["PQ"] - 1.0) < 1e-6
    assert abs(s["PQ_th"] - 1.0) < 1e-6
    assert abs(s["PQ_st"] - 1.0) < 1e-6


def test_half_overlap_is_unmatched():
    gt = np.full((10, 10), 0 * INSTANCE_OFFSET + 1, np.int64)
    pred = np.full((10, 10), -1, np.int64)
    pred[:, :5] = 0 * INSTANCE_OFFSET + 1  # IoU 0.5 (not > 0.5)
    ev = PQEvaluator(num_things=1, num_stuff=0)
    ev.add_image(pred, gt)
    s = ev.summarize()
    assert s["PQ"] == 0.0


def test_matched_with_fp_penalty():
    gt = np.zeros((8, 8), np.int64)           # one stuff class 0 segment
    pred = gt.copy()
    pred[:2, :2] = 0 * INSTANCE_OFFSET + 0    # same class; this IS the match
    # add a spurious segment of another class
    pred2 = gt.copy()
    pred2[:4, :4] = 1 * INSTANCE_OFFSET
    ev = PQEvaluator(num_things=0, num_stuff=2)
    ev.add_image(pred2, gt)
    s = ev.summarize()
    # class 0 matched with IoU 48/64; class 1 has 1 FP
    assert 0.0 < s["PQ"] < 1.0


def test_class_confusion_not_matched():
    gt = np.full((6, 6), 0 * INSTANCE_OFFSET + 1, np.int64)
    pred = np.full((6, 6), 1 * INSTANCE_OFFSET + 1, np.int64)
    ev = PQEvaluator(num_things=2, num_stuff=0)
    ev.add_image(pred, gt)
    s = ev.summarize()
    assert s["PQ"] == 0.0
