"""Detection primitives: boxes, NMS, anchors, RoIAlign, assign/sample."""

import jax
import jax.numpy as jnp
import numpy as np

from vitadapter.det.anchors import base_anchors, grid_anchors
from vitadapter.det.assign import IGNORE, NEG, max_iou_assign, random_sample
from vitadapter.det.boxes import (bbox2delta, bbox_overlaps, delta2bbox, nms,
                                  batched_nms)
from vitadapter.det.roi_align import (assign_fpn_levels, crop_resize_masks,
                                      roi_align)


def test_delta_roundtrip():
    rng = np.random.RandomState(0)
    rois = np.abs(rng.rand(10, 2)) * 50
    rois = np.concatenate([rois, rois + 10 + rng.rand(10, 2) * 60], -1)
    gt = np.abs(rng.rand(10, 2)) * 40
    gt = np.concatenate([gt, gt + 5 + rng.rand(10, 2) * 80], -1)
    d = bbox2delta(jnp.asarray(rois), jnp.asarray(gt), (0.1, 0.1, 0.2, 0.2))
    back = delta2bbox(jnp.asarray(rois), d, (0.1, 0.1, 0.2, 0.2))
    np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-4, atol=1e-3)


def test_iou_matches_naive():
    rng = np.random.RandomState(1)
    a = np.sort(rng.rand(5, 2, 2) * 10, axis=1).transpose(0, 2, 1).reshape(5, 4)
    a = a[:, [0, 2, 1, 3]]
    b = np.sort(rng.rand(4, 2, 2) * 10, axis=1).transpose(0, 2, 1).reshape(4, 4)
    b = b[:, [0, 2, 1, 3]]
    got = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
    for i in range(5):
        for j in range(4):
            ix = max(0, min(a[i, 2], b[j, 2]) - max(a[i, 0], b[j, 0]))
            iy = max(0, min(a[i, 3], b[j, 3]) - max(a[i, 1], b[j, 1]))
            inter = ix * iy
            ar = ((a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
                  + (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1]) - inter)
            np.testing.assert_allclose(got[i, j], inter / max(ar, 1e-6),
                                       rtol=1e-5, atol=1e-6)


def _naive_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or not np.isfinite(scores[i]):
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            ix = max(0, min(boxes[i, 2], boxes[j, 2]) - max(boxes[i, 0], boxes[j, 0]))
            iy = max(0, min(boxes[i, 3], boxes[j, 3]) - max(boxes[i, 1], boxes[j, 1]))
            inter = ix * iy
            union = ((boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                     + (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
                     - inter)
            if inter / max(union, 1e-6) > thr:
                suppressed[j] = True
    return keep


def test_nms_matches_naive():
    rng = np.random.RandomState(2)
    for seed in range(3):
        rng = np.random.RandomState(seed)
        xy = rng.rand(30, 2) * 20
        wh = rng.rand(30, 2) * 15 + 1
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rng.rand(30).astype(np.float32)
        ob, os_, ki = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 30)
        got = [int(i) for i in np.asarray(ki) if i >= 0]
        expect = _naive_nms(boxes, scores, 0.5)
        assert got == expect


def test_batched_nms_separates_classes():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 10.5, 10.5]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    # same class -> second suppressed; different classes -> both kept
    _, s1, l1, k1 = batched_nms(boxes, scores, jnp.asarray([0, 0]), 0.5, 2)
    assert int((np.asarray(k1) >= 0).sum()) == 1
    _, s2, l2, k2 = batched_nms(boxes, scores, jnp.asarray([0, 1]), 0.5, 2)
    assert int((np.asarray(k2) >= 0).sum()) == 2


def test_base_anchors_geometry():
    a = base_anchors(16, [8], [0.5, 1.0, 2.0])
    assert a.shape == (3, 4)
    w = a[:, 2] - a[:, 0]
    h = a[:, 3] - a[:, 1]
    np.testing.assert_allclose(h / w, [0.5, 1.0, 2.0], rtol=1e-5)
    np.testing.assert_allclose(w * h, (16 * 8) ** 2, rtol=1e-5)
    g = grid_anchors((2, 3), 16, [8], [1.0])
    assert g.shape == (6, 4)
    np.testing.assert_allclose(g[1] - g[0], [16, 0, 16, 0], atol=1e-5)


def _naive_roi_align(feat, roi, out, scale, S=2):
    H, W, C = feat.shape
    x1, y1, x2, y2 = roi * scale
    bw, bh = max(x2 - x1, 1e-6), max(y2 - y1, 1e-6)
    res = np.zeros((out, out, C))
    for i in range(out):
        for j in range(out):
            acc = np.zeros(C)
            for si in range(S):
                for sj in range(S):
                    y = y1 + (i * S + si + 0.5) * bh / (out * S) - 0.5
                    x = x1 + (j * S + sj + 0.5) * bw / (out * S) - 0.5
                    x0, y0 = int(np.floor(x)), int(np.floor(y))
                    lx, ly = x - x0, y - y0
                    v = 0
                    for dy, wy in ((0, 1 - ly), (1, ly)):
                        for dx, wx in ((0, 1 - lx), (1, lx)):
                            xi, yi = x0 + dx, y0 + dy
                            if 0 <= xi < W and 0 <= yi < H:
                                v = v + feat[yi, xi] * wy * wx
                    acc += v
            res[i, j] = acc / (S * S)
    return res


def test_roi_align_matches_naive():
    rng = np.random.RandomState(0)
    feat = rng.randn(12, 16, 3).astype(np.float32)
    rois = np.asarray([[4, 4, 40, 32], [0, 0, 64, 48], [10, 6, 22, 30]],
                      np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 4, 0.25))
    for r in range(3):
        expect = _naive_roi_align(feat, rois[r], 4, 0.25)
        np.testing.assert_allclose(got[r], expect, rtol=1e-4, atol=1e-5)


def test_fpn_level_assignment():
    rois = jnp.asarray([[0, 0, 56, 56], [0, 0, 112, 112], [0, 0, 448, 448],
                        [0, 0, 20, 20]], jnp.float32)
    lvl = np.asarray(assign_fpn_levels(rois, 4))
    np.testing.assert_array_equal(lvl, [0, 1, 3, 0])


def test_crop_resize_masks_centers():
    masks = np.zeros((2, 16, 16), np.float32)
    masks[0, :8] = 1          # top half
    masks[1, :, 8:] = 1       # right half
    rois = jnp.asarray([[0, 0, 16, 16], [0, 0, 16, 16]], jnp.float32)
    out = np.asarray(crop_resize_masks(jnp.asarray(masks), rois,
                                       jnp.asarray([0, 1]), 8))
    assert out[0][:4].mean() == 1.0 and out[0][5:].mean() == 0.0
    assert out[1][:, 5:].mean() == 1.0 and out[1][:, :4].mean() == 0.0


def test_assigner_and_sampler():
    anchors = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30], [0, 0, 9, 11],
                           [100, 100, 110, 110]], jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 10], [19, 19, 31, 31]], jnp.float32)
    assigned, miou = max_iou_assign(anchors, gt, jnp.asarray([True, True]),
                                    0.7, 0.3, 0.3)
    a = np.asarray(assigned)
    assert a[0] == 0 and a[1] == 1 and a[3] == NEG
    # sampler: fixed budget, positives flagged, indices valid
    s = random_sample(jax.random.PRNGKey(0), assigned, 4, 0.5)
    assert s.idx.shape == (4,)
    assert int(s.is_pos.sum()) == 2
    got_pos = set(int(i) for i, p in zip(np.asarray(s.idx),
                                         np.asarray(s.is_pos)) if p)
    assert got_pos <= {0, 1, 2}


def test_assigner_no_valid_gt():
    anchors = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    gt = jnp.zeros((2, 4), jnp.float32)
    assigned, _ = max_iou_assign(anchors, gt, jnp.zeros((2,), bool))
    assert int(assigned[0]) == NEG


def test_snip_area_thresholds_match_reference_tables():
    from vitadapter.det.mask_utils import (get_area_thr, scale_range_filter,
                                           snip_gt_weights)
    import numpy as np

    # spot checks against reference _get_area_thr (detr_head.py:477-545)
    assert get_area_thr(600, "v1") == (124.0 ** 2, 1e10 ** 2)
    assert get_area_thr(1100, "v1") == (28.0 ** 2, 1e10 ** 2)
    assert get_area_thr(1500, "v1") == (0.0, 6.0 ** 2)
    assert get_area_thr(1200, "v2") == (32.0 ** 2, 160.0 ** 2)
    assert get_area_thr(1700, "v3") == (0.0, 64.0 ** 2)
    assert get_area_thr(900, "v4") == (60.0 ** 2, 1e10 ** 2)

    w = snip_gt_weights(np.array([10.0, 200.0 ** 2]), 1500, "v1", weight=0.1)
    assert w[0] == 1.0 and np.isclose(w[1], 0.1)  # big box invalid at 1500

    boxes = np.array([[0, 0, 4, 4], [0, 0, 300, 300]], np.float32)
    keep = scale_range_filter(boxes, 600, "v1")
    assert not keep[0] and keep[1]  # small box dropped at small scale
