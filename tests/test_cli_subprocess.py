"""L7 CLI layer: train.py / test.py driven as real subprocesses.

The reference's public contract is `train.py CONFIG` / `test.py CONFIG CKPT
--eval X` (SURVEY §5.6); the loop-level tests cover the internals, this
covers the argument parsing, config loading, checkpoint handoff, and eval
routing end-to-end.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=2400):
    # generous: each subprocess pays the full torch+jax import and 8-device
    # XLA compile from a cold cache, and may share the host with the rest
    # of the suite
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    return subprocess.run([sys.executable] + args, cwd=ROOT, env=env,
                          capture_output=True, text=True, timeout=timeout)


def _write_tiny_cfg(tmp_path):
    cfg = tmp_path / "tiny.py"
    cfg.write_text("""
model = dict(
    type="EncoderDecoder",
    backbone=dict(
        type="ViTAdapter", patch_size=16, embed_dim=48, depth=4,
        num_heads=4, deform_num_heads=4, conv_inplane=16,
        interaction_indexes=[[0, 0], [1, 1], [2, 2], [3, 3]]),
    decode_head=dict(type="UPerHead", num_classes=5, channels=32),
    auxiliary_head=dict(type="FCNHead", num_classes=5, channels=16),
    aux_in_index=2,
)
data = dict(dataset_type="ADE20KDataset", crop_size=[64, 64],
            samples_per_chip=1)
runner = dict(max_iters=2)
optimizer = dict(lr=1e-3, weight_decay=0.01)
lr_config = dict(warmup_iters=1)
log_config = dict(interval=1)
checkpoint_config = dict(interval=2)
test_cfg = dict(mode="whole")
""")
    return str(cfg)


def test_train_cli_synthetic_and_test_cli_eval(tmp_path):
    cfg = _write_tiny_cfg(tmp_path)
    work = str(tmp_path / "work")

    r = _run(["train.py", cfg, "--synthetic-data", "--work-dir", work,
              "--max-iters", "2"])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "iter 2/2" in r.stdout, r.stdout[-2000:]
    ckpt = os.path.join(work, "ckpt")
    assert os.path.isdir(ckpt)

    # eval routing: mIoU on a tiny on-disk dataset via --cfg-options
    img_dir = tmp_path / "imgs"
    ann_dir = tmp_path / "anns"
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    import numpy as np
    from PIL import Image
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (40, 48, 3), np.uint8)).save(
            img_dir / f"{i}.jpg")
        # ADE convention: 0 = ignore, classes are 1-based on disk
        Image.fromarray(rng.randint(1, 6, (40, 48)).astype(np.uint8)).save(
            ann_dir / f"{i}.png")
    r = _run(["test.py", cfg, ckpt, "--eval", "mIoU", "--max-images", "2",
              "--cfg-options", f"data.train.img_dir={img_dir}",
              f"data.train.ann_dir={ann_dir}",
              f"data.val.img_dir={img_dir}",
              f"data.val.ann_dir={ann_dir}"])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "mIoU" in r.stdout, r.stdout[-2000:]
