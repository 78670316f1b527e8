"""Cascade R-CNN + TTA merge tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vitadapter.det.cascade import (CascadeRCNN, merge_aug_detections,
                                    remove_boxes_by_scale, soft_nms)
from vitadapter.models.vit_adapter import ViTAdapter

TINY_BACKBONE = dict(patch_size=16, embed_dim=48, depth=4, num_heads=4,
                     deform_num_heads=4, conv_inplane=16,
                     interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))


def _model(**kw):
    return CascadeRCNN(backbone=ViTAdapter(**TINY_BACKBONE), num_classes=4,
                       fpn_channels=32, num_proposals=40, num_roi_samples=16,
                       max_dets=8, **kw)


def test_cascade_inference():
    model = _model(use_extra_attention=True, with_semantic=True)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(1), img)
    out = jax.jit(model.apply)(vars_, img)
    assert out["boxes"].shape == (1, 8, 4)
    assert out["masks"].shape == (1, 8, 28, 28)
    assert np.isfinite(np.asarray(out["masks"])).all()


def test_cascade_train_losses():
    model = _model(with_semantic=True)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(1), img)
    G, H, W = 3, 64, 64
    rng = np.random.RandomState(0)
    xy = rng.rand(1, G, 2) * 24
    wh = rng.rand(1, G, 2) * 24 + 8
    gtb = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    gtl = jnp.asarray(rng.randint(0, 4, (1, G)), jnp.int32)
    gtm = jnp.asarray((rng.rand(1, G, H, W) > 0.5), jnp.float32)
    gtv = jnp.ones((1, G), bool)

    gts = jnp.asarray(rng.randint(0, 10, (1, H, W)), jnp.int32)

    def loss_fn(p):
        losses, _ = model.apply(
            {"params": p, "batch_stats": vars_["batch_stats"]}, img,
            train=True, gt_boxes=gtb, gt_labels=gtl, gt_masks=gtm,
            gt_valid=gtv, rng=jax.random.PRNGKey(2), gt_semantic=gts,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(3)})
        return losses["loss"], losses

    (loss, logs), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(vars_["params"])
    assert np.isfinite(float(loss))
    assert np.isfinite(float(logs["loss_semantic"]))
    for s in range(3):
        for k in ("loss_cls", "loss_bbox", "loss_mask"):
            assert np.isfinite(float(logs[f"s{s}.{k}"]))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_soft_nms_decays_overlaps():
    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 10, 10], [50, 50, 60, 60]],
                       np.float64)
    scores = np.asarray([0.9, 0.8, 0.7])
    keep, new_s = soft_nms(boxes, scores, method="gaussian")
    assert keep[0] == 0
    i1 = list(keep).index(1)
    assert new_s[i1] < 0.8            # overlapped box decayed
    i2 = list(keep).index(2)
    np.testing.assert_allclose(new_s[i2], 0.7, atol=1e-6)  # far box untouched


def test_scale_gating_and_merge():
    r_small = {"boxes": np.asarray([[0, 0, 20, 20], [0, 0, 200, 200]],
                                   np.float64),
               "scores": np.asarray([0.9, 0.95]),
               "labels": np.asarray([0, 0])}
    r_large = {"boxes": np.asarray([[1, 1, 201, 201]], np.float64),
               "scores": np.asarray([0.8]), "labels": np.asarray([0])}
    # small scale keeps only small boxes; large scale keeps only large
    merged = merge_aug_detections([r_small, r_large],
                                  scale_ranges=[(0, 100), (100, 10000)])
    # the 200px box from r_small was gated out; large box from r_large kept
    areas = np.sqrt((merged["boxes"][:, 2] - merged["boxes"][:, 0])
                    * (merged["boxes"][:, 3] - merged["boxes"][:, 1]))
    assert ((areas < 100) | (abs(areas - 200) < 2)).all()
    assert len(merged["boxes"]) == 2
