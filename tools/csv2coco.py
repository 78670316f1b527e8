#!/usr/bin/env python
"""WSDM CSV -> COCO-format JSON (reference `wsdm2023/tools/csv2coco.py` role).

Expects columns: image, width, height, left, top, right, bottom, question.
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import csv
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("csv_file")
    p.add_argument("out_json")
    args = p.parse_args()

    images, annotations = [], []
    with open(args.csv_file) as f:
        for i, row in enumerate(csv.DictReader(f)):
            w = int(float(row.get("width", 0)))
            h = int(float(row.get("height", 0)))
            images.append({"id": i, "file_name": row["image"].split("/")[-1],
                           "width": w, "height": h,
                           "question": row.get("question", "")})
            x1, y1 = float(row["left"]), float(row["top"])
            x2, y2 = float(row["right"]), float(row["bottom"])
            annotations.append({
                "id": i, "image_id": i, "category_id": 1,
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "area": (x2 - x1) * (y2 - y1), "iscrowd": 0})
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "answer"}]}
    with open(args.out_json, "w") as f:
        json.dump(coco, f)
    print(f"wrote {len(images)} images")


if __name__ == "__main__":
    main()
