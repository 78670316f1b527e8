"""COCO evaluator sanity: analytic AP cases."""

import numpy as np

from vitadapter.det.coco_eval import COCOEvaluator, box_iou


def _gts(boxes, labels):
    return {"boxes": np.asarray(boxes, np.float64),
            "labels": np.asarray(labels)}


def test_perfect_detections_ap1():
    ev = COCOEvaluator(num_classes=2)
    gt = _gts([[0, 0, 50, 50], [60, 60, 100, 100]], [0, 1])
    det = {"boxes": gt["boxes"], "scores": np.asarray([0.9, 0.8]),
           "labels": np.asarray([0, 1])}
    ev.add_image(det, gt)
    s = ev.summarize()
    assert abs(s["bbox_mAP"] - 1.0) < 1e-6
    assert abs(s["mAP_50"] - 1.0) < 1e-6
    assert abs(s["AR@100"] - 1.0) < 1e-6


def test_missing_detection_halves_recall():
    ev = COCOEvaluator(num_classes=1)
    gt = _gts([[0, 0, 50, 50], [60, 60, 100, 100]], [0, 0])
    det = {"boxes": np.asarray([[0, 0, 50, 50]], np.float64),
           "scores": np.asarray([0.9]), "labels": np.asarray([0])}
    ev.add_image(det, gt)
    s = ev.summarize()
    # precision 1 up to recall 0.5, then 0: AP ~ 51/101
    np.testing.assert_allclose(s["mAP_50"], 51 / 101, atol=1e-6)


def test_false_positive_reduces_ap():
    ev = COCOEvaluator(num_classes=1)
    gt = _gts([[0, 0, 50, 50]], [0])
    det = {"boxes": np.asarray([[200, 200, 250, 250], [0, 0, 50, 50]],
                               np.float64),
           "scores": np.asarray([0.95, 0.9]), "labels": np.asarray([0, 0])}
    ev.add_image(det, gt)
    s = ev.summarize()
    # top det is FP: precision at full recall = 1/2 (envelope keeps 0.5)
    np.testing.assert_allclose(s["mAP_50"], 0.5, atol=1e-2)


def test_localization_quality_affects_high_iou_only():
    ev = COCOEvaluator(num_classes=1)
    gt = _gts([[0, 0, 100, 100]], [0])
    det = {"boxes": np.asarray([[0, 0, 100, 80]], np.float64),  # IoU 0.8
           "scores": np.asarray([0.9]), "labels": np.asarray([0])}
    ev.add_image(det, gt)
    s = ev.summarize()
    assert abs(s["mAP_50"] - 1.0) < 1e-6
    assert s["mAP_75"] == 1.0          # IoU 0.8 >= 0.75
    assert s["bbox_mAP"] < 0.75        # fails at IoU .85/.9/.95


def test_crowd_gt_not_fp():
    ev = COCOEvaluator(num_classes=1)
    gt = {"boxes": np.asarray([[0, 0, 100, 100]], np.float64),
          "labels": np.asarray([0]), "iscrowd": np.asarray([True])}
    det = {"boxes": np.asarray([[10, 10, 50, 50]], np.float64),
           "scores": np.asarray([0.9]), "labels": np.asarray([0])}
    ev.add_image(det, gt)
    s = ev.summarize()
    # only a crowd gt: no countable gts -> NaN-safe metrics
    assert np.isnan(s["bbox_mAP"]) or s["bbox_mAP"] >= 0


def test_padded_invalid_dets_ignored():
    ev = COCOEvaluator(num_classes=1)
    gt = _gts([[0, 0, 50, 50]], [0])
    det = {"boxes": np.asarray([[0, 0, 50, 50], [0, 0, 0, 0]], np.float64),
           "scores": np.asarray([0.9, -np.inf]),
           "labels": np.asarray([0, -1])}
    ev.add_image(det, gt)
    s = ev.summarize()
    assert abs(s["bbox_mAP"] - 1.0) < 1e-6


def test_box_iou_crowd_semantics():
    d = np.asarray([[0, 0, 10, 10]], np.float64)
    g = np.asarray([[0, 0, 100, 100]], np.float64)
    assert abs(box_iou(d, g)[0, 0] - 0.01) < 1e-6
    assert abs(box_iou(d, g, np.asarray([True]))[0, 0] - 1.0) < 1e-6
