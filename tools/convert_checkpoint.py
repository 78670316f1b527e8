#!/usr/bin/env python
"""Checkpoint conversion tools (host-side).

Covers the reference's checkpoint utilities:
  * Uni-Perceiver key remap (`detection/mmcv_custom/uniperceiver_converter.py`
    + `wsdm2023/tools/convertor.py`): `fused_encoder.* -> layers.*`,
    `in_proj_ -> in_proj.`, `video_embed -> visual_embed`.
  * EMA-weight strip (`wsdm2023/release.py`): drop `ema_*` keys and rename.
  * torch -> flax conversion entry (see `vitadapter.utils.checkpoint`).
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import re


def remap_uniperceiver_keys(sd):
    """Reference R5 key remap, applied before torch->flax conversion."""
    out = {}
    for k, v in sd.items():
        k = k.replace("fused_encoder.", "layers.")
        k = k.replace("in_proj_weight", "in_proj.weight")
        k = k.replace("in_proj_bias", "in_proj.bias")
        k = k.replace("video_embed", "visual_embed")
        out[k] = v
    return out


def strip_ema(sd):
    """Keep only EMA weights if present (reference release.py), else pass
    through; drops optimizer/meta entries."""
    ema = {k[len("ema_"):].replace("_", "."): v for k, v in sd.items()
           if k.startswith("ema_")}
    if ema:
        return ema
    return {k: v for k, v in sd.items()
            if not k.startswith(("optimizer", "meta"))}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help="torch checkpoint (.pth)")
    p.add_argument("dst", help="output orbax dir or .npz")
    p.add_argument("--kind", default="segmentor",
                   choices=["segmentor", "backbone", "uniperceiver"])
    p.add_argument("--target-grid", type=int, default=None,
                   help="resample BEiT rel-pos tables to this grid")
    args = p.parse_args()

    import numpy as np
    import torch

    from vitadapter.utils import checkpoint as ck

    ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = ck.unwrap_state_dict(ckpt)
    sd = strip_ema(sd)
    if args.kind == "uniperceiver":
        sd = remap_uniperceiver_keys(sd)
    if args.kind == "segmentor":
        variables = ck.convert_segmentor_checkpoint(
            sd, target_grid=args.target_grid)
    else:
        params, stats = ck.convert_vit_adapter_backbone(sd)
        variables = {"params": params, "batch_stats": stats}

    import jax
    flat = {"/".join(map(str, path)): np.asarray(v)
            for path, v in jax.tree_util.tree_flatten_with_path(
                variables)[0]}
    np.savez(args.dst if args.dst.endswith(".npz") else args.dst + ".npz",
             **flat)
    print(f"wrote {len(flat)} arrays")


if __name__ == "__main__":
    main()
