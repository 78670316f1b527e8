"""COCO dataset utilities: RLE round-trip, polygon rasterization, padding."""

import json
import os

import numpy as np

from vitadapter.data.coco import (CocoDataset, decode_rle, encode_rle,
                                  pad_targets, polygons_to_mask)


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        m = (rng.rand(13, 17) > 0.6).astype(np.uint8)
        rle = encode_rle(m)
        back = decode_rle(rle["counts"], rle["size"])
        np.testing.assert_array_equal(back, m)


def test_rle_uncompressed():
    # column-major runs: 3 zeros, 4 ones, rest zeros in a 3x4 mask
    m = decode_rle([3, 4, 5], (3, 4))
    flat = m.T.reshape(-1)
    np.testing.assert_array_equal(flat[:7], [0, 0, 0, 1, 1, 1, 1])
    assert flat[7:].sum() == 0


def test_polygon_rasterization():
    m = polygons_to_mask([[2, 2, 10, 2, 10, 8, 2, 8]], 12, 14)
    assert m[5, 5] == 1 and m[0, 0] == 0
    assert m.sum() >= 9 * 7  # at least the interior


def test_coco_dataset_and_padding(tmp_path):
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    from PIL import Image
    Image.fromarray(np.zeros((20, 30, 3), np.uint8)).save(img_dir / "a.jpg")
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg", "height": 20, "width": 30}],
        "categories": [{"id": 7, "name": "x"}, {"id": 9, "name": "y"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 9,
             "bbox": [2, 3, 10, 8], "iscrowd": 0,
             "segmentation": [[2, 3, 12, 3, 12, 11, 2, 11]], "area": 80},
            {"id": 2, "image_id": 1, "category_id": 7,
             "bbox": [0, 0, 5, 5], "iscrowd": 1,
             "segmentation": {"size": [20, 30],
                              "counts": [0, 5, 15, 5, 15, 5, 555]},
             "area": 25},
        ],
    }
    ann_path = tmp_path / "ann.json"
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    ds = CocoDataset(str(ann_path), str(img_dir))
    assert len(ds) == 1 and ds.num_classes == 2
    img, t = ds.load(0)
    assert img.shape == (20, 30, 3)
    np.testing.assert_allclose(t["boxes"][0], [2, 3, 12, 11])
    assert t["labels"][0] == 1          # cat id 9 -> contiguous label 1
    assert t["masks"].shape == (2, 20, 30)
    assert t["iscrowd"].tolist() == [False, True]
    p = pad_targets(t, 5)
    assert p["boxes"].shape == (5, 4) and p["masks"].shape == (5, 20, 30)
    assert p["valid"].tolist() == [True, False, False, False, False]
