#!/usr/bin/env python
"""Evaluate a checkpoint: `python test.py CONFIG CKPT --eval mIoU [--aug-test]`.

Public API parity with the reference (`segmentation/test.py`): slide/whole
inference per `test_cfg`, optional flip TTA, prints aAcc/mIoU/mAcc.
Accepts either an orbax train-state directory or a torch .pth checkpoint
(converted through `vitadapter.utils.checkpoint`).
"""

import argparse
import os

# honor an explicit JAX_PLATFORMS even though the axon sitecustomize
# prepends 'axon' to jax_platforms (same guard as train.py / conftest)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from vitadapter.utils.compilation_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

KNOWN_METRICS = ("mIoU", "bbox", "segm", "PQ", "IoU")


def parse_args():
    p = argparse.ArgumentParser(description="Test a model")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--eval", nargs="+", default=["mIoU"])
    p.add_argument("--aug-test", action="store_true",
                   help="multi-scale + flip TTA")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--cfg-options", nargs="+", default=None)
    args = p.parse_args()
    # fail loudly on anything that would otherwise be silently ignored
    # (reference `detection/test.py:219-243` always honors its flags)
    unknown = [m for m in args.eval if m not in KNOWN_METRICS]
    if unknown:
        p.error(f"unknown --eval metric(s) {unknown}; "
                f"choose from {list(KNOWN_METRICS)}")
    if args.aug_test and "PQ" in args.eval:
        p.error("--aug-test is not supported for --eval PQ")
    return args


def load_variables(path: str, cfg):
    if os.path.isdir(path):  # orbax train state
        import jax

        from vitadapter.builder import build_model
        from vitadapter.data.preprocess import normalize
        from vitadapter.train.optim import make_optimizer
        from vitadapter.train.trainer import TrainState
        from vitadapter.utils.checkpoint_io import restore_checkpoint
        import jax.numpy as jnp

        model = build_model(dict(cfg.model))
        crop = tuple(cfg.data["crop_size"])
        img = jnp.zeros((1, *crop, 3), jnp.float32)
        mtype = cfg.model["type"]
        if mtype == "GroundingDINO":
            ids = jnp.zeros((1, cfg.data.get("max_sent_len", 128)), jnp.int32)
            init = lambda k, x: model.init(k, x, ids, ids)
        elif mtype == "EncoderDecoder":
            init = lambda k, x: model.init(k, x, with_aux=True)
        else:
            init = model.init
        variables = jax.jit(init)(jax.random.PRNGKey(0), normalize(img))
        tx, _ = make_optimizer(variables["params"])
        template = TrainState.create(variables["params"],
                                     variables["batch_stats"], tx)
        state = restore_checkpoint(path, template)
        return {"params": state.params, "batch_stats": state.batch_stats}
    # torch checkpoint: route by model family
    import torch

    from vitadapter.utils.checkpoint import (
        convert_grounding_dino_checkpoint, convert_segmentor_checkpoint)

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    mtype = cfg.model["type"]
    if mtype in ("GroundingDINO", "DINO"):
        return convert_grounding_dino_checkpoint(ckpt)
    if mtype in ("MaskRCNN", "CascadeRCNN", "ATSS", "GFL", "SparseRCNN"):
        from vitadapter.utils.checkpoint import convert_detector_checkpoint
        return convert_detector_checkpoint(ckpt)
    return convert_segmentor_checkpoint(ckpt)


def main():
    args = parse_args()
    from vitadapter.train.loop import build_dataset, run_eval
    from vitadapter.utils.config import Config, parse_cfg_options

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(parse_cfg_options(args.cfg_options))
    variables = load_variables(args.checkpoint, cfg)
    if "IoU" in args.eval:
        # single-box grounding Acc@0.5/mIoU (reference vg_dataset.py:45-100)
        from vitadapter.train.det_loop import (build_det_dataset,
                                               run_grounding_eval)
        dataset = build_det_dataset(cfg.data, "val")
        run_grounding_eval(cfg, variables, dataset, aug_test=args.aug_test,
                           max_images=args.max_images)
    elif "PQ" in args.eval:
        # panoptic quality (reference configs/mask2former/README.md:84)
        from vitadapter.data.coco import CocoPanopticDataset
        from vitadapter.train.det_loop import run_panoptic_eval
        sub = cfg.data["val"]
        root = cfg.data.get("data_root", "")
        dataset = CocoPanopticDataset(
            os.path.join(root, sub["ann_file"]),
            os.path.join(root, sub["img_dir"]),
            seg_dir=(os.path.join(root, sub["seg_dir"])
                     if "seg_dir" in sub else None))
        run_panoptic_eval(cfg, variables, dataset,
                          max_images=args.max_images)
    elif any(m in args.eval for m in ("bbox", "segm")):
        from vitadapter.train.det_loop import build_det_dataset, run_det_eval
        dataset = build_det_dataset(cfg.data, "val")
        iou_types = tuple(t for t in ("bbox", "segm") if t in args.eval) \
            or ("bbox",)
        # multi-scale TTA (reference HTC-Aug protocol) needs the config's
        # `tta` dict; run_det_eval raises if --aug-test lacks one
        run_det_eval(cfg, variables, dataset, iou_types=iou_types,
                     aug_test=args.aug_test, max_images=args.max_images)
    else:
        dataset = build_dataset(cfg.data, "val")
        run_eval(cfg, variables, dataset, aug_test=args.aug_test,
                 max_images=args.max_images)


if __name__ == "__main__":
    main()
