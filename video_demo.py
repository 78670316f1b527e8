#!/usr/bin/env python
"""Frame-sequence demo: run a model over a directory of frames.

Counterpart of the reference `video_demo.py` (cv2-free: operates on an
extracted frame directory, writes annotated frames; assemble with ffmpeg).
"""

import argparse
import glob
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("frames_dir", help="directory of ordered frame images")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--out-dir", default="video_out")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--cfg-options", nargs="+", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image, ImageDraw

    import test as test_cli
    from vitadapter.builder import build_model
    from vitadapter.data.preprocess import normalize, pad_to_multiple
    from vitadapter.utils.config import Config

    from vitadapter.utils.config import parse_cfg_options

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(parse_cfg_options(args.cfg_options))
    model = build_model(dict(cfg.model))
    variables = test_cli.load_variables(args.checkpoint, cfg)
    os.makedirs(args.out_dir, exist_ok=True)

    infer = jax.jit(lambda v, x: model.apply(v, normalize(x)))
    frames = sorted(glob.glob(os.path.join(args.frames_dir, "*")))
    for fp in frames:
        img = np.asarray(Image.open(fp).convert("RGB"))
        x, (H, W) = pad_to_multiple(jnp.asarray(img, jnp.float32)[None], 32)
        out = infer(variables, x)
        vis = Image.fromarray(img.copy())
        if isinstance(out, dict):
            draw = ImageDraw.Draw(vis)
            for b, s in zip(np.asarray(out["boxes"][0]),
                            np.asarray(out["scores"][0])):
                if np.isfinite(s) and s >= args.score_thr:
                    draw.rectangle([float(v) for v in b],
                                   outline=(255, 0, 0), width=2)
        else:
            pred = np.asarray(jnp.argmax(out[:, :H, :W], -1)[0])
            rng = np.random.RandomState(0)
            palette = rng.randint(0, 255, (int(pred.max()) + 1, 3), np.uint8)
            vis = Image.fromarray(
                (0.5 * img + 0.5 * palette[pred]).astype(np.uint8))
        vis.save(os.path.join(args.out_dir, os.path.basename(fp)))
    print(f"wrote {len(frames)} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
