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
from vitadapter.data.preprocess import normalize
from vitadapter.data import transforms as T
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


def train_batches(dataset, data_cfg, batch_size: int, seed: int = 0,
                  sampler=None) -> Iterator[Dict[str, np.ndarray]]:
    """`sampler` (shared `data.loader.EpochSampler`) gives DistributedSampler
    epoch semantics across prefetch threads; without one, each stream draws
    its own per-thread permutations (sampling with replacement globally)."""
    rng = np.random.RandomState(seed)
    crop = tuple(data_cfg["crop_size"])
    scale = tuple(data_cfg["scale"])
    rr = tuple(data_cfg.get("ratio_range", (0.5, 2.0)))
    cmr = data_cfg.get("cat_max_ratio", 0.75)
    n = len(dataset)
    order = rng.permutation(n)
    pos = 0
    while True:
        if sampler is not None:
            idxs = sampler.take(batch_size)
        else:
            idxs = []
            for _ in range(batch_size):
                if pos >= n:
                    order = rng.permutation(n)
                    pos = 0
                idxs.append(int(order[pos]))
                pos += 1
        imgs, segs = [], []
        for idx in idxs:
            img, seg = dataset.load(idx)
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
        # compute (reference: multi-worker DataLoader); the shared sampler
        # keeps DistributedSampler epoch semantics across the threads
        from vitadapter.data.loader import EpochSampler, prefetch
        sampler = EpochSampler(len(ds), seed=0)
        it = prefetch(lambda s: train_batches(ds, cfg.data, batch, seed=s,
                                              sampler=sampler),
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
    """mIoU evaluation under the reference test protocol
    (`test.py --eval mIoU [--aug-test]`), see `models/seg_protocol.py`:
    keep-ratio resize to the test `img_scale` -> ResizeToMultiple(32) ->
    slide/whole inference -> logits resized to ori_shape -> softmax ->
    unflip -> average over augs -> argmax vs the original-resolution label.

    `aug_test=True` runs the reference `--aug-test` ratios
    (0.5..1.75 + flip, `segmentation/test.py:131-136`) unless the config's
    `aug_test` dict overrides them. Ratios scale the img_scale *canvas*
    (MultiScaleFlipAug mode 2), not the native image size.

    Distributed: images sharing a (scaled-shape, ori-bucket) signature batch
    over the data mesh; per-image ori sizes ride in host-built interpolation
    matrices so one compiled assembly program covers the whole signature.
    """
    from vitadapter.models import seg_protocol as SP
    from vitadapter.parallel.mesh import make_mesh, shard_batch

    model = build_model(dict(cfg.model))
    num_classes = cfg.model["decode_head"]["num_classes"]
    test_cfg = dict(cfg.get("test_cfg", {}))
    mode = test_cfg.get("mode", "whole")
    img_scale = (test_cfg.get("img_scale")
                 or cfg.get("data", {}).get("test_scale")
                 or cfg.get("data", {}).get("scale"))
    divisor = test_cfg.get("size_divisor", 32)
    if img_scale is None and mode == "whole":
        # out-of-protocol configs (no test scale): bound the whole-mode
        # compile set by resizing to a coarser multiple instead
        divisor = test_cfg.get("pad_bucket", 128)
    img_scale = tuple(img_scale) if img_scale is not None else None

    ms_cfg = dict(cfg.get("aug_test") or {}) if aug_test else None
    if aug_test and not ms_cfg:
        # reference `--aug-test` hardcodes this set (test.py:131-136)
        ms_cfg = dict(img_ratios=[0.5, 0.75, 1.0, 1.25, 1.5, 1.75], flip=True)
    ratios = tuple(ms_cfg["img_ratios"]) if ms_cfg else (1.0,)
    do_flip = bool(ms_cfg.get("flip", True)) if ms_cfg else False
    flips = (False, True) if do_flip else (False,)
    n_aug = len(ratios) * len(flips)

    crop = tuple(test_cfg["crop_size"]) if mode == "slide" else None
    stride = tuple(test_cfg.get("stride") or crop) if mode == "slide" else None
    ori_bucket = test_cfg.get("ori_bucket", 128)

    mesh = make_mesh()
    D = len(mesh.devices.reshape(-1))
    cpd = test_cfg.get("crops_per_device", 2)
    CB = D * cpd

    score_cache: Dict[tuple, Any] = {}
    asm_cache: Dict[tuple, Any] = {}
    fin_cache: Dict[tuple, Any] = {}

    def scorer(ce):
        if ce not in score_cache:
            score_cache[ce] = jax.jit(
                lambda x: model.apply(variables, normalize(x)))
        return score_cache[ce]

    def assembler(key):
        # key = (h2, w2, ce, ys, xs, hob, wob)
        if key not in asm_cache:
            h2, w2, ce, ys, xs, hob, wob = key
            cnt = jnp.asarray(SP.count_map(h2, w2, ce, ys, xs))

            def asm(crop_logits, mh, mw):
                # crop_logits (D, nc, ceh, cew, K); static slide grid
                Db = crop_logits.shape[0]
                canvas = jnp.zeros((Db, h2, w2, num_classes), jnp.float32)
                k = 0
                for y in ys:
                    for x0 in xs:
                        patch = jax.lax.dynamic_slice(
                            canvas, (0, y, x0, 0),
                            (Db, ce[0], ce[1], num_classes))
                        canvas = jax.lax.dynamic_update_slice(
                            canvas, patch + crop_logits[:, k], (0, y, x0, 0))
                        k += 1
                canvas = canvas / cnt
                # bucket-padded per-image resize to ori_shape; the unflip is
                # baked into mw (reversed rows)
                o = jnp.einsum("doh,dhwk->dowk", mh, canvas)
                o = jnp.einsum("dow,dhwk->dhok", mw, o)
                return jax.nn.softmax(o, axis=-1)

            asm_cache[key] = jax.jit(asm)
        return asm_cache[key]

    def finisher(ob):
        if ob not in fin_cache:
            fin_cache[ob] = jax.jit(
                lambda acc, seg: confusion_matrix(
                    jnp.argmax(acc, axis=-1), seg, num_classes))
        return fin_cache[ob]

    def score_crops(crops):
        """Fixed-chunk scoring: pad the crop stream to CB multiples, run the
        single compiled model call per chunk (sharded over the mesh)."""
        N = crops.shape[0]
        ce = crops.shape[1:3]
        fn = scorer((ce[0], ce[1]))
        outs = []
        for s in range(0, N, CB):
            chunk = crops[s:s + CB]
            pad = CB - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]), np.float32)])
            sb = shard_batch(mesh, {"x": chunk})
            outs.append(fn(sb["x"]))
        logits = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
        return logits[:N]

    cm = np.zeros((num_classes, num_classes), np.int64)
    n = min(len(dataset), max_images or len(dataset))
    pending: Dict[tuple, list] = {}
    done = 0

    def plans_for(ho, wo):
        if img_scale is None:
            h1w1 = (ho, wo)
            return [(h1w1, SP.to_multiple(ho, wo, divisor))
                    for _ in ratios]
        return [SP.variant_plan(ho, wo, img_scale, r, divisor)
                for r in ratios]

    def flush(key):
        nonlocal cm, done
        items = pending.pop(key, [])
        if not items:
            return
        k_real = len(items)
        slack = (-len(items)) % D
        items = [(img, seg, plans, True) for (img, seg, plans) in items]
        items += [items[-1][:3] + (False,)] * slack  # batch slack; 255-masked
        hob, wob = key[0]
        labels = np.full((len(items), hob, wob), 255, np.int32)
        for j, (img, seg, plans, real) in enumerate(items):
            if real:
                labels[j, :seg.shape[0], :seg.shape[1]] = seg
        acc = None
        for ri, _ in enumerate(ratios):
            h1w1s = [it[2][ri][0] for it in items]
            (h2, w2) = items[0][2][ri][1]
            ce, ys, xs = (SP.slide_plan(h2, w2, crop, stride) if mode == "slide"
                          else ((h2, w2), (0,), (0,)))
            for fl in flips:
                xs_np = np.stack([
                    SP.prepare_variant_image(img, h1w1s[j], (h2, w2), fl)
                    for j, (img, _, _, _) in enumerate(items)])
                crops = np.concatenate(
                    [SP.extract_crops(x, ce, ys, xs) for x in xs_np])
                logits = score_crops(crops).reshape(
                    len(items), len(ys) * len(xs), ce[0], ce[1], num_classes)
                mh = np.stack([SP.ori_matrices(
                    h2, w2, it[1].shape[0], it[1].shape[1], hob, wob, fl)[0]
                    for it in items])
                mw = np.stack([SP.ori_matrices(
                    h2, w2, it[1].shape[0], it[1].shape[1], hob, wob, fl)[1]
                    for it in items])
                b = shard_batch(mesh, {"l": logits, "mh": mh, "mw": mw})
                probs = assembler((h2, w2, ce, ys, xs, hob, wob))(
                    b["l"], b["mh"], b["mw"])
                acc = probs if acc is None else acc + probs
        acc = acc / n_aug  # stays device-resident and mesh-sharded
        sb = shard_batch(mesh, {"seg": labels})
        cm += np.asarray(finisher((hob, wob))(acc, sb["seg"]), np.int64)
        done += k_real
        if done % 50 < k_real or done == n:
            log_fn(f"eval {done}/{n}")

    for i in range(n):
        img, seg = dataset.load(i)
        img = np.asarray(img)
        seg = np.asarray(seg, np.int32)
        ho, wo = seg.shape[:2]
        plans = plans_for(ho, wo)
        hob = -(-ho // ori_bucket) * ori_bucket
        wob = -(-wo // ori_bucket) * ori_bucket
        key = ((hob, wob), tuple(p[1] for p in plans))
        pending.setdefault(key, []).append((img, seg, plans))
        if len(pending[key]) == D:
            flush(key)
    for key in list(pending):
        flush(key)
    metrics = miou_from_confusion(cm)
    log_fn(f"aAcc {metrics['aAcc']*100:.2f} | mIoU {metrics['mIoU']*100:.2f} "
           f"| mAcc {metrics['mAcc']*100:.2f}")
    return metrics
