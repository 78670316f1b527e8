"""Config-driven training / evaluation loops for segmentation.

Replaces the reference's mm runner stack (IterBasedRunner + hooks,
`detection/train.py:88-188` flow): one jit-compiled data-parallel step over a
device mesh, host-side data pipeline, periodic logging (lr / layer-0 lr / ETA
/ data_time — reference `CustomizedTextLoggerHook`), orbax checkpoints, and a
slide/whole-mode mIoU eval hook.
"""

import os
import time
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vitadapter.builder import build_model
from vitadapter.data.datasets import DATASETS
from vitadapter.data.metrics import confusion_matrix, miou_from_confusion
from vitadapter.data.preprocess import (normalize, pad_to_bucket,
                                         pad_to_multiple)
from vitadapter.data import transforms as T
from vitadapter.models.segmentor import flip_tta, slide_inference
from vitadapter.parallel.mesh import make_mesh, replicate, shard_batch
from vitadapter.train.optim import make_optimizer
from vitadapter.train.trainer import TrainState, make_seg_train_step
from vitadapter.utils.checkpoint_io import (latest_step, restore_checkpoint,
                                            save_checkpoint)


def build_dataset(data_cfg: Dict[str, Any], split: str):
    ds_cls = DATASETS[data_cfg["dataset_type"]]
    sub = data_cfg[split]
    root = data_cfg.get("data_root", "")
    return ds_cls(os.path.join(root, sub["img_dir"]),
                  os.path.join(root, sub["ann_dir"]) if sub.get("ann_dir")
                  else None)


def train_batches(dataset, data_cfg, batch_size: int,
                  seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    rng = np.random.RandomState(seed)
    crop = tuple(data_cfg["crop_size"])
    scale = tuple(data_cfg["scale"])
    rr = tuple(data_cfg.get("ratio_range", (0.5, 2.0)))
    cmr = data_cfg.get("cat_max_ratio", 0.75)
    n = len(dataset)
    order = rng.permutation(n)
    pos = 0
    while True:
        imgs, segs = [], []
        for _ in range(batch_size):
            if pos >= n:
                order = rng.permutation(n)
                pos = 0
            img, seg = dataset.load(int(order[pos]))
            pos += 1
            img, seg = T.train_transform(rng, img, seg, crop, scale, rr, cmr)
            imgs.append(img)
            segs.append(seg)
        yield {"image": np.stack(imgs).astype(np.float32),
               "label": np.stack(segs).astype(np.int32)}


def synthetic_batches(batch_size: int, crop, num_classes: int):
    rng = np.random.RandomState(0)
    while True:
        yield {
            "image": rng.randint(0, 256, (batch_size, *crop, 3)).astype(np.float32),
            "label": rng.randint(0, num_classes,
                                 (batch_size, *crop)).astype(np.int32),
        }


class SyntheticSegDataset:
    """Tiny fixed in-memory (img, seg) set for the synthetic-mode eval hook."""

    def __init__(self, n: int, crop, num_classes: int, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.items = [
            (rng.randint(0, 256, (*crop, 3)).astype(np.uint8),
             rng.randint(0, num_classes, crop).astype(np.int32))
            for _ in range(n)]

    def __len__(self):
        return len(self.items)

    def load(self, i: int):
        return self.items[i]


def run_training(cfg, work_dir: str, resume: bool = False,
                 max_iters: Optional[int] = None, synthetic: bool = False,
                 log_fn=print):
    model = build_model(dict(cfg.model))
    num_classes = cfg.model["decode_head"]["num_classes"]
    crop = tuple(cfg.data["crop_size"])
    mesh = make_mesh()
    n_dev = len(mesh.devices.reshape(-1))
    batch = cfg.data.get("samples_per_chip", 2) * n_dev
    total = max_iters or cfg.runner["max_iters"]

    is_m2f = cfg.model["type"] == "EncoderDecoderMask2Former"
    init_img = jnp.zeros((batch, *crop, 3), jnp.float32)
    if is_m2f:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                        normalize(init_img))
    else:
        variables = jax.jit(
            lambda k, x: model.init(k, x, with_aux=True))(
                jax.random.PRNGKey(0), normalize(init_img))
    opt = cfg.optimizer
    tx, schedule = make_optimizer(
        variables["params"], base_lr=opt["lr"],
        weight_decay=opt["weight_decay"],
        depth=cfg.model["backbone"]["depth"],
        layer_decay_rate=opt.get("layer_decay_rate", 1.0),
        total_steps=total, warmup_steps=cfg.lr_config.get("warmup_iters", 1500),
        grad_clip=opt.get("grad_clip"),
        lr_policy=cfg.lr_config.get("policy", "poly"))
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    state = replicate(mesh, state)

    start = 0
    ckpt_dir = os.path.join(work_dir, "ckpt")
    if resume and latest_step(ckpt_dir) is not None:
        start = latest_step(ckpt_dir)
        state = restore_checkpoint(ckpt_dir, state)
        log_fn(f"resumed from step {start}")

    if is_m2f:
        from vitadapter.train.trainer import make_m2f_train_step

        tc = cfg.get("train_cfg", {})
        raw_step = make_m2f_train_step(
            model, num_classes=num_classes,
            max_instances=tc.get("max_instances", 60),
            num_points=tc.get("num_points", 12544))
    else:
        raw_step = make_seg_train_step(model, cfg.get("aux_loss_weight", 0.4))

    def step_fn(state, image, label, rng):
        img = normalize(image)
        return raw_step(state, {"image": img, "label": label}, rng)

    jstep = jax.jit(step_fn, donate_argnums=(0,))

    if synthetic:
        it = synthetic_batches(batch, crop, num_classes)
    else:
        ds = build_dataset(cfg.data, "train")
        # threaded prefetch hides host-side decode/augment behind device
        # compute (reference: multi-worker DataLoader)
        from vitadapter.data.loader import prefetch
        it = prefetch(lambda s: train_batches(ds, cfg.data, batch, seed=s),
                      num_threads=cfg.data.get("workers", 4))

    log_int = cfg.get("log_config", {}).get("interval", 50)
    ckpt_int = cfg.get("checkpoint_config", {}).get("interval", 1000)

    # in-training evaluation + best-checkpoint selection (the reference's
    # mmcv EvalHook: `evaluation = dict(interval=8000, metric='mIoU',
    # save_best='mIoU')`, config `...896_80k_ade20k_ss.py:157`)
    ev_cfg = dict(cfg.get("evaluation", {}))
    ev_int = ev_cfg.get("interval")
    val_ds = None
    if ev_int:
        if synthetic:
            val_ds = SyntheticSegDataset(2, crop, num_classes)
        else:
            try:
                val_ds = build_dataset(cfg.data, "val")
            except (KeyError, FileNotFoundError) as e:
                log_fn(f"eval hook disabled (no val dataset: {e})")
                ev_int = None
    best = -float("inf")

    rng = jax.random.PRNGKey(1)
    t_last = time.perf_counter()
    data_time = 0.0
    # double-buffer: fetch + device_put of the NEXT batch happens after the
    # (async) step dispatch, overlapping device compute
    sb = shard_batch(mesh, next(it))
    for i in range(start, total):
        rng, sub = jax.random.split(rng)
        state, logs = jstep(state, sb["image"], sb["label"], sub)
        t0 = time.perf_counter()
        if i + 1 < total:
            sb = shard_batch(mesh, next(it))
        data_time += time.perf_counter() - t0
        if (i + 1) % log_int == 0:
            logs = {k: float(v) for k, v in logs.items()}
            dt = time.perf_counter() - t_last
            eta = dt / log_int * (total - i - 1)
            lr = float(schedule(i))
            log_fn(f"iter {i+1}/{total} loss={logs['loss']:.4f} "
                   f"lr={lr:.3e} time={dt/log_int:.3f}s "
                   f"data_time={data_time/log_int:.3f}s "
                   f"eta={eta/3600:.2f}h grad_norm={logs['grad_norm']:.2f}")
            t_last = time.perf_counter()
            data_time = 0.0
        if (i + 1) % ckpt_int == 0 or (i + 1) == total:
            save_checkpoint(ckpt_dir, i + 1, jax.device_get(state),
                            cfg.get("checkpoint_config", {}).get(
                                "max_keep_ckpts", 1))
        if ev_int and ((i + 1) % ev_int == 0 or (i + 1) == total):
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            metrics = run_eval(cfg, variables, val_ds,
                               max_images=ev_cfg.get("max_images"),
                               log_fn=log_fn)
            key = ev_cfg.get("save_best")
            if key and metrics.get(key, -float("inf")) > best:
                best = metrics[key]
                save_checkpoint(os.path.join(work_dir, f"best_{key}"),
                                i + 1, jax.device_get(state))
                log_fn(f"iter {i+1}: new best {key}={best:.4f} "
                       f"-> {work_dir}/best_{key}")
            t_last = time.perf_counter()  # don't count eval in step time
    return state


def run_eval(cfg, variables, dataset, aug_test: bool = False,
             max_images: Optional[int] = None, log_fn=print) -> Dict[str, float]:
    """Slide/whole-mode mIoU evaluation (reference `test.py --eval mIoU`).

    `aug_test=True` with an `aug_test` dict in the config runs the reference
    multi-scale+flip protocol (the `_ms` configs); without one it runs
    flip-only TTA (the `_ss` protocol with `--aug-test`).
    """
    from vitadapter.models.segmentor import multi_scale_flip_aug

    model = build_model(dict(cfg.model))
    num_classes = cfg.model["decode_head"]["num_classes"]
    mode = cfg.get("test_cfg", {}).get("mode", "whole")
    ms_cfg = cfg.get("aug_test") if aug_test else None

    @jax.jit
    def crop_logits(img):
        return model.apply(variables, normalize(img))

    fn = crop_logits
    if aug_test and not ms_cfg:
        fn = flip_tta(crop_logits)

    slide_args = {}
    if mode == "slide":
        slide_args = dict(crop_size=tuple(cfg.test_cfg["crop_size"]),
                          stride=tuple(cfg.test_cfg["stride"]))

    def batch_logits(x):
        if ms_cfg:
            return multi_scale_flip_aug(
                crop_logits, x, num_classes,
                ratios=tuple(ms_cfg.get("img_ratios",
                                        (0.5, 0.75, 1.0, 1.25, 1.5, 1.75))),
                flip=ms_cfg.get("flip", True), **slide_args)
        if mode == "slide":
            return slide_inference(fn, x, tuple(cfg.test_cfg["crop_size"]),
                                   tuple(cfg.test_cfg["stride"]),
                                   num_classes)
        return fn(x)

    @jax.jit
    def batch_cm(x, seg):
        pred = jnp.argmax(batch_logits(x), axis=-1)
        return confusion_matrix(pred, seg, num_classes)

    # distributed evaluation (reference `dist_test.sh` / multi_gpu_test,
    # SURVEY 3.2): images batch per pad-bucket shape and shard over the
    # data mesh; the confusion-matrix scatter-add reduces across devices
    # inside the jit. Padding labels with 255 makes batch slack exact.
    from vitadapter.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    D = len(mesh.devices.reshape(-1))
    cm = np.zeros((num_classes, num_classes), np.int64)
    n = min(len(dataset), max_images or len(dataset))
    bucket = cfg.get("test_cfg", {}).get("pad_bucket", 128)
    pending: Dict[tuple, list] = {}
    done = 0

    def flush(shape_key):
        nonlocal cm, done
        items = pending.pop(shape_key, [])
        if not items:
            return
        k = sum(1 for _, _, real in items if real)
        while len(items) % D:
            im, sg, _ = items[-1]
            items.append((im, sg, False))  # batch slack; masked below
        xs = np.stack([im for im, _, real in items])
        segs = np.stack([sg for _, sg, real in items])
        for j, (_, _, real) in enumerate(items):
            if not real:
                segs[j][:] = 255  # all-ignore: contributes nothing
        b = shard_batch(mesh, {"x": xs.astype(np.float32),
                               "seg": segs.astype(np.int32)})
        cm += np.asarray(batch_cm(b["x"], b["seg"]), np.int64)
        done += k
        if done % 50 < k or done == n:
            log_fn(f"eval {done}/{n}")

    for i in range(n):
        img, seg = dataset.load(i)
        x = jnp.asarray(img, jnp.float32)[None]
        x, (H, W) = pad_to_bucket(x, bucket)
        xp = np.asarray(x[0])
        sp = np.full(xp.shape[:2], 255, np.int32)
        sp[:H, :W] = np.asarray(seg)
        key = xp.shape[:2]
        pending.setdefault(key, []).append((xp, sp, True))
        if len(pending[key]) == D:
            flush(key)
    for key in list(pending):
        flush(key)
    metrics = miou_from_confusion(cm)
    log_fn(f"aAcc {metrics['aAcc']*100:.2f} | mIoU {metrics['mIoU']*100:.2f} "
           f"| mAcc {metrics['mAcc']*100:.2f}")
    return metrics
