"""Brute-force COCOeval cross-validation (VERDICT r3 #5).

`det/coco_eval.py` is a vectorized/pooled reimplementation of the COCO
protocol. This file transcribes the official pycocotools `cocoeval.py`
algorithm literally (per-image `evaluateImg` loops + `accumulate` +
`summarize`) as an independent oracle, then property-tests the evaluator
against it over randomized scenarios: crowds, score ties, empty categories,
area-range edges, annotation-area gating, per-category maxDets truncation,
and AR@{1,10,100} — the semantics that produced the pinned reference
printout (`detection/README.md:202-232`).
"""

import numpy as np
import pytest

from vitadapter.det.coco_eval import (AREA_RANGES, COCOEvaluator, IOU_THRS,
                                      RECALL_THRS, box_iou, mask_iou)


# ---------------------------------------------------------------------------
# literal pycocotools transcription (the oracle)
# ---------------------------------------------------------------------------

def _evaluate_img(dt_scores, ious, gt_ig_base, gt_area, crowd, d_area,
                  a_rng, max_det):
    """cocoeval.evaluateImg: dt already score-sorted; returns per-threshold
    (dtm matched?, dtIg) plus the non-ignored gt count."""
    T = len(IOU_THRS)
    G = len(gt_area)
    gt_ig = gt_ig_base | (gt_area < a_rng[0]) | (gt_area > a_rng[1])
    gtind = np.argsort(gt_ig, kind="mergesort")  # ignored last
    D = min(max_det, len(dt_scores))
    dtm = np.zeros((T, D))
    gtm = np.zeros((T, G))
    dt_ig_out = np.zeros((T, D), bool)
    for tind, t in enumerate(IOU_THRS):
        for dind in range(D):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gi in range(G):
                g = gtind[gi]
                if gtm[tind, gi] > 0 and not crowd[g]:
                    continue
                if m > -1 and not gt_ig[gtind_of(gtind, m)] and gt_ig[g]:
                    break
                if ious[dind, g] < iou:
                    continue
                iou = ious[dind, g]
                m = gi
            if m == -1:
                continue
            dt_ig_out[tind, dind] = gt_ig[gtind[m]]
            dtm[tind, dind] = 1
            gtm[tind, m] = dind + 1
    a = (d_area[:D] < a_rng[0]) | (d_area[:D] > a_rng[1])
    dt_ig_out = dt_ig_out | ((dtm == 0) & a[None, :])
    n_gt = int((~gt_ig).sum())
    return dtm.astype(bool), dt_ig_out, n_gt, dt_scores[:D]


def gtind_of(gtind, m):
    return gtind[m]


def brute_cocoeval(images, K, iou_type="bbox", max_dets=100):
    """cocoeval accumulate + summarize over a list of (dets, gts) images."""
    a_names = list(AREA_RANGES)
    md_list = [1, 10, max_dets]
    R, T, A, M = len(RECALL_THRS), len(IOU_THRS), len(a_names), len(md_list)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))

    # per (image, cat): sorted dets, ious, gt fields
    prepped = []
    for dets, gts in images:
        d_scores = np.asarray(dets["scores"], np.float64)
        order = np.argsort(-d_scores, kind="mergesort")
        d_labels = np.asarray(dets["labels"])[order]
        d_boxes = np.asarray(dets["boxes"], np.float64)[order]
        d_scores = d_scores[order]
        g_boxes = np.asarray(gts["boxes"], np.float64)
        g_labels = np.asarray(gts["labels"])
        crowd = np.asarray(gts.get("iscrowd",
                                   np.zeros(len(g_labels), bool)), bool)
        per_cat = {}
        for c in range(K):
            dsel = np.where(d_labels == c)[0]
            gsel = np.where(g_labels == c)[0]
            if len(dsel) == 0 and len(gsel) == 0:
                continue
            if iou_type == "segm":
                dm = np.asarray(dets["masks"])[order][dsel]
                gm = np.asarray(gts["masks"])[gsel]
                ious = mask_iou(dm, gm, crowd[gsel])
                d_area = (dm.reshape(len(dsel), -1).astype(bool).sum(-1)
                          if len(dsel) else np.zeros(0))
                g_area = (gm.reshape(len(gsel), -1).astype(bool).sum(-1)
                          if len(gsel) else np.zeros(0))
            else:
                ious = box_iou(d_boxes[dsel], g_boxes[gsel], crowd[gsel])
                d_area = np.prod(
                    np.clip(d_boxes[dsel, 2:] - d_boxes[dsel, :2], 0, None),
                    -1)
                g_area = np.prod(
                    np.clip(g_boxes[gsel, 2:] - g_boxes[gsel, :2], 0, None),
                    -1)
            if gts.get("area") is not None:
                g_area = np.asarray(gts["area"], np.float64)[gsel]
            per_cat[c] = dict(scores=d_scores[dsel], ious=ious,
                              crowd=crowd[gsel], g_area=g_area.astype(
                                  np.float64), d_area=d_area.astype(
                                  np.float64))
        prepped.append(per_cat)

    for c in range(K):
        for ai, an in enumerate(a_names):
            a_rng = AREA_RANGES[an]
            for mi, md in enumerate(md_list):
                scores, tps, igs, npig = [], [], [], 0
                for per_cat in prepped:
                    if c not in per_cat:
                        continue
                    r = per_cat[c]
                    dtm, dtig, n_gt, s = _evaluate_img(
                        r["scores"], r["ious"], r["crowd"].copy(),
                        r["g_area"], r["crowd"], r["d_area"], a_rng, md)
                    npig += n_gt
                    scores.append(s)
                    tps.append(dtm)
                    igs.append(dtig)
                if npig == 0:
                    continue
                if scores:
                    scores = np.concatenate(scores)
                    inds = np.argsort(-scores, kind="mergesort")
                    dtm = np.concatenate(tps, axis=1)[:, inds]
                    dtig = np.concatenate(igs, axis=1)[:, inds]
                else:
                    dtm = np.zeros((T, 0), bool)
                    dtig = np.zeros((T, 0), bool)
                tps_ = dtm & ~dtig
                fps_ = ~dtm & ~dtig
                tp_sum = np.cumsum(tps_, axis=1).astype(np.float64)
                fp_sum = np.cumsum(fps_, axis=1).astype(np.float64)
                for t in range(T):
                    tp, fp = tp_sum[t], fp_sum[t]
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros(R)
                    recall[t, c, ai, mi] = rc[-1] if nd else 0
                    pr = pr.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds2 = np.searchsorted(rc, RECALL_THRS, side="left")
                    for ri, pi in enumerate(inds2):
                        try:
                            q[ri] = pr[pi]
                        except IndexError:
                            break
                    precision[t, :, c, ai, mi] = q

    def summ(s):
        valid = s[s > -1]
        return float(valid.mean()) if valid.size else float("nan")

    return {
        ("bbox_mAP" if iou_type == "bbox" else "segm_mAP"):
            summ(precision[:, :, :, 0, 2]),
        "mAP_50": summ(precision[0, :, :, 0, 2]),
        "mAP_75": summ(precision[5, :, :, 0, 2]),
        "mAP_s": summ(precision[:, :, :, 1, 2]),
        "mAP_m": summ(precision[:, :, :, 2, 2]),
        "mAP_l": summ(precision[:, :, :, 3, 2]),
        "AR@1": summ(recall[:, :, 0, 0]),
        "AR@10": summ(recall[:, :, 0, 1]),
        "AR@100": summ(recall[:, :, 0, 2]),
        "AR_s": summ(recall[:, :, 1, 2]),
        "AR_m": summ(recall[:, :, 2, 2]),
        "AR_l": summ(recall[:, :, 3, 2]),
    }


# ---------------------------------------------------------------------------
# scenario generator
# ---------------------------------------------------------------------------

def random_scenario(rng, K, with_area_field, segm=False, hw=40):
    """Random dets/gts with crowds, ties, empty categories, tiny/huge boxes."""
    images = []
    for _ in range(rng.randint(1, 4)):
        n_gt = rng.randint(0, 6)
        # sides spanning the small/medium/large boundaries (32^2, 96^2)
        sides = rng.choice([3, 20, 31, 32, 33, 64, 95, 96, 97, 150],
                           size=n_gt)
        xy = rng.rand(n_gt, 2) * 60
        g_boxes = np.concatenate([xy, xy + sides[:, None]], -1)
        g_labels = rng.randint(0, K, n_gt)
        crowd = rng.rand(n_gt) < 0.25
        gts = {"boxes": g_boxes.astype(np.float64), "labels": g_labels,
               "iscrowd": crowd}
        if with_area_field:
            # annotation (segmentation) area != bbox area
            gts["area"] = (sides.astype(np.float64) ** 2) * 0.8
        # dets: jittered copies of gts + pure noise, quantized scores (ties)
        n_dt = rng.randint(0, 10)
        d_boxes, d_labels = [], []
        for _ in range(n_dt):
            if n_gt and rng.rand() < 0.6:
                j = rng.randint(n_gt)
                b = g_boxes[j] + rng.randn(4) * 3
                d_labels.append(g_labels[j] if rng.rand() < 0.8
                                else rng.randint(K))
            else:
                s = rng.choice([5, 30, 60, 120])
                p = rng.rand(2) * 60
                b = np.concatenate([p, p + s + rng.rand(2) * 4])
                d_labels.append(rng.randint(K))
            d_boxes.append(np.clip(b, 0, None))
        dets = {"boxes": np.asarray(d_boxes, np.float64).reshape(-1, 4),
                "labels": np.asarray(d_labels, np.int64),
                "scores": np.round(rng.rand(n_dt), 1)}  # heavy ties
        if segm:
            def boxes_to_masks(bx):
                m = np.zeros((len(bx), hw, hw), np.uint8)
                for i, b in enumerate(bx):
                    x1, y1, x2, y2 = (np.clip(b, 0, hw - 1) * hw / 220
                                      ).astype(int)
                    m[i, y1:max(y2, y1 + 1), x1:max(x2, x1 + 1)] = 1
                return m
            gts["masks"] = boxes_to_masks(g_boxes)
            dets["masks"] = boxes_to_masks(dets["boxes"])
        images.append((dets, gts))
    return images


def run_both(images, K, iou_type, max_dets=100):
    ev = COCOEvaluator(K, iou_type=iou_type, max_dets=max_dets)
    for dets, gts in images:
        ev.add_image(dets, gts)
    got = ev.summarize()
    want = brute_cocoeval(images, K, iou_type=iou_type, max_dets=max_dets)
    assert set(got) == set(want)
    for k in want:
        if np.isnan(want[k]):
            assert np.isnan(got[k]), (k, got[k])
        else:
            np.testing.assert_allclose(got[k], want[k], atol=1e-12,
                                       err_msg=k)


@pytest.mark.parametrize("seed", range(60))
def test_bbox_random_scenarios_match_brute_force(seed):
    rng = np.random.RandomState(seed)
    K = int(rng.randint(1, 4))
    images = random_scenario(rng, K, with_area_field=bool(seed % 2))
    run_both(images, K, "bbox")


@pytest.mark.parametrize("seed", range(61, 81))
def test_segm_random_scenarios_match_brute_force(seed):
    rng = np.random.RandomState(seed)
    K = int(rng.randint(1, 3))
    images = random_scenario(rng, K, with_area_field=bool(seed % 2),
                             segm=True)
    run_both(images, K, "segm")


@pytest.mark.parametrize("seed", range(81, 101))
def test_small_maxdets_truncation_matches(seed):
    """Per-(image, category) det truncation at tiny budgets."""
    rng = np.random.RandomState(seed)
    K = int(rng.randint(1, 3))
    images = random_scenario(rng, K, with_area_field=False)
    run_both(images, K, "bbox", max_dets=3)


def test_score_tie_ordering_is_stable():
    """All-equal scores: pooled ordering must be image-then-det stable on
    both sides (mergesort), so metrics agree exactly."""
    rng = np.random.RandomState(7)
    images = []
    for _ in range(3):
        g = np.asarray([[0, 0, 40, 40], [50, 50, 90, 90]], np.float64)
        d = g + rng.randn(2, 4)
        images.append((
            {"boxes": d, "labels": np.zeros(2, np.int64),
             "scores": np.full(2, 0.5)},
            {"boxes": g, "labels": np.zeros(2, np.int64)}))
    run_both(images, 1, "bbox")
