#!/usr/bin/env python
"""Grounding submission generation: raw images + questions -> CSV of boxes.

Parity target: `wsdm2023/generate_results.py:13-50` (batch inference over a
CSV of (image, question), writing predicted boxes for submission).
"""

import argparse
import csv
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("input_csv")
    p.add_argument("out_csv")
    p.add_argument("--img-root", default="")
    p.add_argument("--max-sent-len", type=int, default=128)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from vitadapter.builder import build_model
    from vitadapter.data.preprocess import normalize, pad_to_multiple
    from vitadapter.data.tokenization import ClipTokenizer
    from vitadapter.utils.config import Config

    cfg = Config.fromfile(args.config)
    model = build_model(dict(cfg.model))
    tok = ClipTokenizer()

    import test as test_cli
    variables = test_cli.load_variables(args.checkpoint, cfg)

    @jax.jit
    def infer(img, ids, mask):
        return model.apply(variables, normalize(img), ids, mask)

    rows = []
    with open(args.input_csv) as f:
        for row in csv.DictReader(f):
            img = np.asarray(Image.open(
                os.path.join(args.img_root, row["image"])).convert("RGB"))
            x, (H, W) = pad_to_multiple(
                jnp.asarray(img, jnp.float32)[None], 32)
            ids, mask = tok.tokenize_refer(row.get("question", ""),
                                           args.max_sent_len)
            out = infer(x, jnp.asarray([ids], jnp.int32),
                        jnp.asarray([mask], jnp.int32))
            b = np.asarray(out["boxes"][0, 0])
            rows.append({"image": row["image"], "left": b[0], "top": b[1],
                         "right": b[2], "bottom": b[3]})
    with open(args.out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["image", "left", "top", "right",
                                          "bottom"])
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {len(rows)} predictions")


if __name__ == "__main__":
    main()
