"""Detection AutoAugment recipe fidelity + threaded prefetch loader.

Reference policy: `detection/configs/mask_rcnn/
mask_rcnn_deit_adapter_tiny_fpn_3x_coco.py:37-97` — RandomFlip ->
AutoAugment[11-scale short-edge resize | resize -> absolute_range crop ->
resize] -> RandomCrop -> Pad; HTC++ configs add PhotoMetricDistortion.
"""

import numpy as np

from vitadapter.data import transforms as T
from vitadapter.data.loader import prefetch


def test_reference_scale_sets():
    # exact mmdet img_scale lists from the reference config (lines 46-49,
    # 55-57): short edges 480..800 step 32, small set {400, 500, 600}
    assert T.DET_SCALES == tuple(range(480, 801, 32))
    assert len(T.DET_SCALES) == 11
    assert T.DET_SCALES_SMALL == (400, 500, 600)


def test_det_resize_short_caps_long_edge():
    img = np.zeros((200, 800, 3), np.uint8)
    boxes = np.asarray([[10.0, 10.0, 100.0, 100.0]], np.float32)
    out, b, _ = T.det_resize_short(img, boxes, None, 480, max_long=1333)
    # 800/200 aspect: long-edge cap binds (480/200=2.4 vs 1333/800=1.67)
    assert max(out.shape[:2]) <= 1333
    assert abs(out.shape[1] - 1333) <= 1
    f = out.shape[1] / 800
    assert np.allclose(b[0], boxes[0] * f, atol=1.0)


def test_det_flip_boxes_and_masks():
    rng = np.random.RandomState(0)
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    boxes = np.asarray([[1.0, 0.0, 3.0, 2.0]], np.float32)
    masks = np.zeros((1, 4, 6), np.uint8)
    masks[0, 0:2, 1:3] = 1
    img2, b2, m2 = T.det_flip(rng, img, boxes, masks, prob=1.0)
    assert np.allclose(b2[0], [3.0, 0.0, 5.0, 2.0])  # w=6: x -> 6-x
    assert (m2[0, 0:2, 3:5] == 1).all()
    assert (img2 == img[:, ::-1]).all()


def test_det_autoaugment_two_policies_reachable():
    sizes = set()
    for seed in range(12):
        rng = np.random.RandomState(seed)
        img = np.zeros((60, 80, 3), np.uint8)
        boxes = np.asarray([[5.0, 5.0, 40.0, 40.0]], np.float32)
        out, b, _ = T.det_autoaugment(rng, img, boxes, None,
                                      scales=(48, 64), scales_small=(32,),
                                      crop_range=(24, 40), max_long=96)
        sizes.add(out.shape[:2])
        assert (b >= 0).all()
    # both branches produce distinct geometries across seeds
    assert len(sizes) >= 3


def test_det_train_transform_static_canvas_and_masks():
    rng = np.random.RandomState(3)
    img = np.random.RandomState(0).randint(0, 255, (70, 50, 3), np.uint8)
    boxes = np.asarray([[5.0, 10.0, 45.0, 60.0]], np.float32)
    masks = np.zeros((1, 70, 50), np.uint8)
    masks[0, 10:60, 5:45] = 1
    for _ in range(5):
        out, b, m, keep = T.det_train_transform(
            rng, img, boxes, masks, (64, 64), scales=(48, 56, 64),
            scales_small=(40,), crop_range=(32, 64), max_long=96)
        assert out.shape == (64, 64, 3)
        assert m.shape[1:] == (64, 64)
        if keep.any():
            x1, y1, x2, y2 = b[keep][0]
            assert 0 <= x1 < x2 <= 64 and 0 <= y1 < y2 <= 64
            # mask stays inside (slightly dilated) box after the same chain
            ys, xs = np.nonzero(m[keep.argmax()])
            if len(ys):
                assert xs.min() >= x1 - 2 and xs.max() <= x2 + 2
                assert ys.min() >= y1 - 2 and ys.max() <= y2 + 2


def test_det_train_transform_photometric_changes_pixels():
    img = np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8)
    boxes = np.zeros((0, 4), np.float32)
    out1, *_ = T.det_train_transform(
        np.random.RandomState(5), img, boxes, None, (64, 64),
        autoaug=False, photometric=False, scales=(64,), max_long=64)
    out2, *_ = T.det_train_transform(
        np.random.RandomState(5), img, boxes, None, (64, 64),
        autoaug=False, photometric=True, scales=(64,), max_long=64)
    assert out1.shape == out2.shape
    assert not (out1 == out2).all()


def test_prefetch_yields_all_and_stops():
    def make_iter(seed):
        def gen():
            for i in range(10):
                yield (seed, i)
        return gen()

    got = list(prefetch(make_iter, num_threads=3, buffer=4))
    assert len(got) == 30
    assert {s for s, _ in got} == {0, 1, 2}
    # early consumer exit doesn't deadlock the producer threads
    it = prefetch(make_iter, num_threads=2, buffer=2)
    next(it)
    it.close()


def test_prefetch_distinct_seeds_into_det_batches(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from test_det_loop import _make_dataset
    from vitadapter.train.det_loop import det_train_batches

    ds = _make_dataset(tmp_path)
    cfg = {"crop_size": [64, 64], "max_instances": 5,
           "det_scales": [48, 64], "det_scales_small": [40],
           "det_crop_range": [40, 64], "max_long_edge": 96}
    it = prefetch(lambda s: det_train_batches(ds, cfg, 2, seed=s),
                  num_threads=2, buffer=2)
    batches = [next(it) for _ in range(4)]
    for b in batches:
        assert b["image"].shape == (2, 64, 64, 3)
    it.close()
