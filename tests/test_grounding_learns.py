"""Grounding-family end-to-end learning proof (VERDICT r2 #8).

Trains a tiny UniPerceiver-Adapter + GroundingDINO through the REAL
`run_det_training` loop (VGDataset from disk, CLIP-BPE tokenized expressions,
CDN losses, auction matching) on a synthetic refer task — one colored
rectangle per image, named by the expression — then checks
`run_grounding_eval` (the `test.py --eval IoU` path) reaches Acc@0.5-IoU far
above chance (random boxes on this geometry score ~0; the reference's quality
contract is the WSDM2023 leaderboard metric, `wsdm2023/README.md`).
"""

import gzip
import json
import os

import numpy as np
from PIL import Image

from vitadapter.train import det_loop
from vitadapter.utils.config import Config

NAMES = ["red", "green"]
COLORS = {"red": (220, 50, 50), "green": (50, 220, 50)}


def write_refer_task(root):
    os.makedirs(f"{root}/img", exist_ok=True)
    records = {"train": [], "val": []}
    for split, n, seed in (("train", 24, 0), ("val", 12, 77)):
        r = np.random.RandomState(seed)
        for i in range(n):
            img = r.randint(10, 60, (96, 96, 3)).astype(np.uint8)
            name = NAMES[r.randint(2)]
            w, h = r.randint(24, 48), r.randint(24, 48)
            x1, y1 = r.randint(0, 96 - w), r.randint(0, 96 - h)
            img[y1:y1 + h, x1:x1 + w] = COLORS[name]
            fn = f"{split}_{i:03d}.png"
            Image.fromarray(img).save(f"{root}/img/{fn}")
            records[split].append(
                {"image": fn, "expression": f"the {name} rectangle",
                 "bbox": [float(x1), float(y1),
                          float(x1 + w), float(y1 + h)]})
    for split, recs in records.items():
        with open(f"{root}/{split}.json", "w") as f:
            json.dump(recs, f)
    # minimal BPE merges fixture: header + a few merges -> near-byte-level
    # tokenization (the tokenizer's merge table is data, not behavior)
    with gzip.open(f"{root}/bpe.txt.gz", "wt", encoding="utf-8") as f:
        f.write("#version: tiny\nt h\ne d</w>\nr e\n")


def test_grounding_dino_learns_refer_task(tmp_path):
    root = str(tmp_path / "data")
    write_refer_task(root)
    cfg = Config({
        "model": {
            "type": "GroundingDINO",
            "backbone": {
                "type": "UniPerceiverAdapter", "patch_size": 16,
                "embed_dim": 48, "depth": 4, "num_heads": 4,
                "vocab_size": 600, "deform_num_heads": 4, "conv_inplane": 16,
                "interaction_indexes": [[0, 0], [1, 1], [2, 2], [3, 3]],
                "num_grounding_blocks": 1,
            },
            "num_classes": 1, "num_queries": 12, "embed_dim": 32,
            "num_heads": 4, "ffn_dim": 64, "num_encoder_layers": 1,
            "num_decoder_layers": 2, "dn_groups": 1, "max_dets": 5,
        },
        "data": {"dataset_type": "VGDataset", "data_root": root,
                 "train": {"ann_file": "train.json", "img_dir": "img"},
                 "val": {"ann_file": "val.json", "img_dir": "img"},
                 "crop_size": [96, 96], "samples_per_chip": 1,
                 "max_instances": 1, "max_sent_len": 16,
                 "autoaug": False, "bpe_vocab": root + "/bpe.txt.gz",
                 "det_scales": [96], "max_long_edge": 96, "workers": 2},
        "runner": {"max_iters": 250},
        "optimizer": {"lr": 1e-3, "weight_decay": 1e-4, "grad_clip": 1.0},
        "log_config": {"interval": 100},
        "checkpoint_config": {"interval": 100000},
        "test_cfg": {"img_scale": [96, 96]},
    })
    state = det_loop.run_det_training(cfg, str(tmp_path / "work"),
                                      log_fn=lambda *_: None)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    val = det_loop.build_det_dataset(cfg.data, "val", with_masks=False)
    metrics = det_loop.run_grounding_eval(cfg, variables, val,
                                          log_fn=lambda *_: None)
    # measured 0.58 Acc@0.5 / 0.44 mIoU at 250 iters; chance is ~0 (random
    # box vs a 24-48px target in a 96px frame). Thresholds are set with
    # slack for seed drift while staying far above chance.
    assert metrics["Acc@0.5"] >= 0.3, metrics
    assert metrics["mIoU"] >= 0.2, metrics
