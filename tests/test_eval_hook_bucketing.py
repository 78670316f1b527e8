"""In-training EvalHook (interval + save_best) and eval shape bucketing.

VERDICT r1 gaps #2 (no in-training evaluation / best-checkpoint selection;
reference `EvalHook`, config `...896_80k_ade20k_ss.py:157`) and Weak #4
(one XLA compile per distinct eval image shape; SURVEY §7 pad-to-bucket).
"""

import os

import numpy as np

import vitadapter.train.loop as loop_mod
from vitadapter.data.preprocess import pad_to_bucket
from vitadapter.utils.config import Config


def _tiny_upernet_cfg(**extra):
    return Config({
        "model": {
            "type": "EncoderDecoder",
            "backbone": {
                "type": "ViTAdapter", "patch_size": 16, "embed_dim": 48,
                "depth": 4, "num_heads": 4, "deform_num_heads": 4,
                "conv_inplane": 16,
                "interaction_indexes": [[0, 0], [1, 1], [2, 2], [3, 3]],
            },
            "decode_head": {"type": "UPerHead", "num_classes": 5,
                            "channels": 32},
            "auxiliary_head": {"type": "FCNHead", "num_classes": 5,
                               "channels": 16},
            "aux_in_index": 2,
        },
        "data": {"crop_size": [64, 64], "samples_per_chip": 1},
        "runner": {"max_iters": 4},
        "optimizer": {"lr": 1e-3, "weight_decay": 0.01},
        "lr_config": {"warmup_iters": 1},
        "log_config": {"interval": 2},
        "checkpoint_config": {"interval": 100},
        "test_cfg": {"mode": "whole"},
        **extra,
    })


def test_pad_to_bucket_bounds_shape_set():
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    shapes = set()
    for _ in range(20):
        h = int(rng.randint(100, 500))
        w = int(rng.randint(100, 500))
        x = jnp.zeros((1, h, w, 3))
        padded, (H, W) = pad_to_bucket(x, step=256)
        assert (H, W) == (h, w)
        assert padded.shape[1] % 256 == 0 and padded.shape[2] % 256 == 0
        assert padded.shape[1] >= h and padded.shape[2] >= w
        shapes.add(padded.shape)
    # with sizes in [100, 500) only 256/512 buckets occur per dim
    assert len(shapes) <= 4
    # step is re-rounded up to the conv divisor
    p2, _ = pad_to_bucket(jnp.zeros((1, 50, 50, 3)), step=30, divisor=32)
    assert p2.shape[1] % 32 == 0


def test_eval_recompiles_bounded(monkeypatch):
    """Whole-mode eval over 20 variable-size images feeds the jitted
    forward a bounded set of scaled shapes (== XLA compiles): with no
    test img_scale configured, run_eval resizes to the coarse
    `pad_bucket` multiple (a documented protocol deviation that only
    applies to configs without a test scale)."""
    import jax
    import jax.numpy as jnp

    cfg = _tiny_upernet_cfg()
    from vitadapter.builder import build_model
    from vitadapter.data.preprocess import normalize

    model = build_model(dict(cfg.model))
    img0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, with_aux=True))(
        jax.random.PRNGKey(0), normalize(img0))

    class VarSizeDS:
        def __init__(self, n=20):
            self.rng = np.random.RandomState(0)
            self.sizes = [(int(self.rng.randint(40, 140)),
                           int(self.rng.randint(40, 140)))
                          for _ in range(n)]

        def __len__(self):
            return len(self.sizes)

        def load(self, i):
            h, w = self.sizes[i]
            return (self.rng.randint(0, 255, (h, w, 3), np.uint8),
                    self.rng.randint(0, 5, (h, w), np.int32))

    from vitadapter.models import seg_protocol as SP

    seen = set()
    orig = SP.prepare_variant_image

    def spy(img, h1w1, h2w2, flip):
        seen.add(h2w2)
        return orig(img, h1w1, h2w2, flip)

    monkeypatch.setattr(SP, "prepare_variant_image", spy)
    metrics = loop_mod.run_eval(cfg, variables, VarSizeDS(),
                                log_fn=lambda *_: None)
    assert np.isfinite(metrics["mIoU"])
    # dims in [40, 140) -> {128, 256} per axis under the 128 bucket
    assert len(seen) <= 4, f"scaled shapes: {seen}"


def test_train_eval_hook_and_save_best(tmp_path):
    cfg = _tiny_upernet_cfg(evaluation={"interval": 2, "metric": "mIoU",
                                        "save_best": "mIoU",
                                        "max_images": 1})
    lines = []
    loop_mod.run_training(cfg, str(tmp_path), synthetic=True,
                          log_fn=lines.append)
    joined = "\n".join(lines)
    assert "mIoU" in joined, joined
    assert "new best mIoU" in joined, joined
    assert os.path.isdir(os.path.join(str(tmp_path), "best_mIoU"))
