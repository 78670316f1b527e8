#!/usr/bin/env python
"""Single-image demo: run a config+checkpoint on an image, save visualization.

Counterpart of the reference `image_demo.py` (segmentation + detection).
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("img")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--out-file", default="demo_out.png")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--cfg-options", nargs="+", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image, ImageDraw

    from vitadapter.builder import build_model
    from vitadapter.data.preprocess import normalize, pad_to_multiple
    from vitadapter.utils.config import Config
    import test as test_cli

    from vitadapter.utils.config import parse_cfg_options

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(parse_cfg_options(args.cfg_options))
    model = build_model(dict(cfg.model))
    variables = test_cli.load_variables(args.checkpoint, cfg)

    img = np.asarray(Image.open(args.img).convert("RGB"))
    x, (H, W) = pad_to_multiple(jnp.asarray(img, jnp.float32)[None], 32)
    out = jax.jit(lambda v, x: model.apply(v, normalize(x)))(variables, x)

    vis = Image.fromarray(img.copy())
    if isinstance(out, dict):  # detector
        draw = ImageDraw.Draw(vis)
        for b, s, l in zip(np.asarray(out["boxes"][0]),
                           np.asarray(out["scores"][0]),
                           np.asarray(out["labels"][0])):
            if not np.isfinite(s) or s < args.score_thr:
                continue
            draw.rectangle([float(v) for v in b], outline=(255, 0, 0),
                           width=2)
            draw.text((float(b[0]), float(b[1])), f"{int(l)}:{s:.2f}",
                      fill=(255, 255, 0))
    else:  # segmentor: blend an argmax color map
        pred = np.asarray(jnp.argmax(out[:, :H, :W], -1)[0])
        rng = np.random.RandomState(0)
        palette = rng.randint(0, 255, (int(pred.max()) + 1, 3), np.uint8)
        overlay = palette[pred]
        vis = Image.fromarray(
            (0.5 * img + 0.5 * overlay).astype(np.uint8))
    vis.save(args.out_file)
    print(f"saved {args.out_file}")


if __name__ == "__main__":
    main()
