#!/usr/bin/env python
"""Export a training checkpoint for release (counterpart of the reference
`wsdm2023/release.py`, which strips `ema_*` keys from a torch state_dict).

Takes an orbax train-state directory (as written by the training loops),
drops the optimizer state, and writes a slim orbax checkpoint holding only
`{"params", "batch_stats"}`. With --use-ema the released params are the EMA
weights (the reference's wsdm training keeps EMA copies that `release.py`
removes; releasing the EMA weights themselves is the usual intent).

Usage: python tools/release.py WORK_DIR/ckpt OUT_DIR [--use-ema] [--step N]
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt_dir", help="orbax train-state checkpoint dir")
    p.add_argument("out_dir", help="output orbax dir for the slim checkpoint")
    p.add_argument("--use-ema", action="store_true",
                   help="release the EMA params instead of the raw params")
    p.add_argument("--step", type=int, default=None)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import orbax.checkpoint as ocp

    from vitadapter.utils.checkpoint_io import latest_step

    step = args.step if args.step is not None else latest_step(args.ckpt_dir)
    if step is None:
        raise SystemExit(f"no checkpoint found under {args.ckpt_dir}")
    # structure-free restore: read whatever tree was saved
    with ocp.CheckpointManager(args.ckpt_dir) as mgr:
        state = mgr.restore(step)
    params = state["ema_params"] if args.use_ema and \
        state.get("ema_params") is not None else state["params"]
    slim = {"params": jax.tree_util.tree_map(np.asarray, params),
            "batch_stats": jax.tree_util.tree_map(
                np.asarray, state["batch_stats"])}
    with ocp.CheckpointManager(args.out_dir) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(slim))
        mgr.wait_until_finished()
    n = sum(x.size for x in jax.tree_util.tree_leaves(slim["params"]))
    print(f"released step {step} ({n / 1e6:.1f}M params"
          f"{', EMA' if args.use_ema else ''}) -> {args.out_dir}")


if __name__ == "__main__":
    main()
