"""Detection host data pipeline: batches from a tiny on-disk COCO dataset."""

import json
import os

import numpy as np
from PIL import Image

from vitadapter.data.coco import CocoDataset
from vitadapter.train.det_loop import det_train_batches


def _make_dataset(tmp_path, n=3):
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    images, annotations = [], []
    rng = np.random.RandomState(0)
    for i in range(n):
        h, w = int(rng.randint(40, 80)), int(rng.randint(40, 80))
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(
            img_dir / f"{i}.jpg")
        images.append({"id": i, "file_name": f"{i}.jpg",
                       "height": h, "width": w})
        annotations.append({
            "id": i, "image_id": i, "category_id": 1,
            "bbox": [5, 5, 20, 15], "iscrowd": 0,
            "segmentation": [[5, 5, 25, 5, 25, 20, 5, 20]], "area": 300})
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": 1, "name": "x"}]}
    path = tmp_path / "ann.json"
    with open(path, "w") as f:
        json.dump(ann, f)
    return CocoDataset(str(path), str(img_dir))


def test_det_train_batches(tmp_path):
    ds = _make_dataset(tmp_path)
    # tiny-geometry scale sets so the AutoAugment policy (built for 1333px
    # COCO) keeps boxes inside the 64px test canvas
    cfg = {"crop_size": [64, 64], "max_instances": 5,
           "det_scales": [48, 56, 64], "det_scales_small": [40, 48],
           "det_crop_range": [40, 64], "max_long_edge": 96}
    it = det_train_batches(ds, cfg, batch_size=2, seed=0)
    for _ in range(3):
        b = next(it)
        assert b["image"].shape == (2, 64, 64, 3)
        assert b["gt_boxes"].shape == (2, 5, 4)
        assert b["gt_masks"].shape == (2, 5, 64, 64)
        assert b["gt_valid"].any()
        # valid boxes stay inside the crop and non-degenerate
        for i in range(2):
            for box, ok in zip(b["gt_boxes"][i], b["gt_valid"][i]):
                if ok:
                    x1, y1, x2, y2 = box
                    assert 0 <= x1 < x2 <= 64 + 1e-3
                    assert 0 <= y1 < y2 <= 64 + 1e-3
        # masks roughly consistent with boxes (mask inside/near box area)
        i, g = np.argwhere(b["gt_valid"])[0]
        m = b["gt_masks"][i, g]
        assert m.sum() > 0
