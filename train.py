#!/usr/bin/env python
"""Train a segmentor from a config file.

Public API parity with the reference (`detection/train.py`, `segmentation/
train.py`): `python train.py CONFIG [--work-dir D] [--resume] [--cfg-options
k=v ...]`. Distribution is implicit: the step is jit-compiled over every
visible chip (data-parallel mesh) — no torch.distributed.launch equivalent
needed; multi-host runs call `jax.distributed.initialize()` first.
"""

import argparse
import os

# The axon sitecustomize prepends 'axon' to jax_platforms regardless of the
# env; honor an explicit JAX_PLATFORMS (e.g. =cpu in CI subprocesses) so a
# TPU-tunnel outage can't fail a CPU run (same guard as tests/conftest.py).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from vitadapter.utils.compilation_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def parse_args():
    p = argparse.ArgumentParser(description="Train a model")
    p.add_argument("config", help="config file path")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in work-dir")
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--synthetic-data", action="store_true",
                   help="random data (pipeline smoke test without a dataset)")
    p.add_argument("--multi-host", action="store_true",
                   help="call jax.distributed.initialize() for DCN bootstrap")
    p.add_argument("--cfg-options", nargs="+", default=None,
                   help="override config entries: key.subkey=value")
    return p.parse_args()


def main():
    args = parse_args()
    if args.multi_host:
        import jax
        jax.distributed.initialize()

    from vitadapter.utils.config import Config, parse_cfg_options

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(parse_cfg_options(args.cfg_options))
    work_dir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)

    DETECTORS = {"MaskRCNN", "CascadeRCNN", "ATSS", "SparseRCNN", "DINO",
                 "GroundingDINO"}
    if cfg.model["type"] in DETECTORS:
        from vitadapter.train.det_loop import run_det_training
        run_det_training(cfg, work_dir, max_iters=args.max_iters,
                         synthetic=args.synthetic_data)
    else:
        from vitadapter.train.loop import run_training
        run_training(cfg, work_dir, resume=args.resume,
                     max_iters=args.max_iters, synthetic=args.synthetic_data)


if __name__ == "__main__":
    main()
