#!/usr/bin/env python
"""Visualize predicted vs ground-truth boxes from a results JSON.

Counterpart of the reference `wsdm2023/tools/drawbbox.py` (pred in red,
gt in green, xywh results keyed by image name), writing annotated PNGs
instead of TensorBoard summaries (no tb/cv2 dependency here).

Usage:
  python tools/drawbbox.py RESULTS.json --ann data/wsdm2023/annotations/test.json \
      --img-dir data/wsdm2023/images --out-dir vis/ [--limit 50]

RESULTS.json: {image_name: [x, y, w, h], ...} (the `generate_results.py`
output format).
"""

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def xywh2xyxy(b):
    x, y, w, h = [float(v) for v in b]
    return [x, y, x + w, y + h]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results", help="results json: {image_name: xywh box}")
    p.add_argument("--ann", required=True, help="COCO-style annotation json")
    p.add_argument("--img-dir", required=True)
    p.add_argument("--out-dir", default="vis")
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()

    from PIL import Image, ImageDraw

    with open(args.ann) as f:
        coco = json.load(f)
    with open(args.results) as f:
        results = json.load(f)

    name_by_id = {im["id"]: (im.get("file_name")
                             or im["coco_url"].split("/")[-1])
                  for im in coco["images"]}
    gt_by_name = {}
    for ann in coco.get("annotations", []):
        name = name_by_id.get(ann["image_id"])
        if name is not None:
            gt_by_name[name] = ann["bbox"]

    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    for name, pred in results.items():
        path = os.path.join(args.img_dir, name)
        if not os.path.isfile(path):
            continue
        img = Image.open(path).convert("RGB")
        draw = ImageDraw.Draw(img)
        draw.rectangle(xywh2xyxy(pred), outline=(255, 0, 0), width=5)
        gt = gt_by_name.get(name)
        if gt is not None:
            draw.rectangle(xywh2xyxy(gt), outline=(0, 255, 0), width=5)
        img.save(os.path.join(args.out_dir, os.path.splitext(name)[0] + ".png"))
        n += 1
        if args.limit and n >= args.limit:
            break
    print(f"wrote {n} visualizations to {args.out_dir}")


if __name__ == "__main__":
    main()
