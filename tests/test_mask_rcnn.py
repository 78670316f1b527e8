"""Mask R-CNN end-to-end smoke: inference shapes + training loss/grads."""

import jax
import jax.numpy as jnp
import numpy as np

from vitadapter.det.mask_rcnn import MaskRCNN
from vitadapter.models.vit_adapter import ViTAdapter

TINY_BACKBONE = dict(patch_size=16, embed_dim=48, depth=4, num_heads=4,
                     deform_num_heads=4, conv_inplane=16,
                     interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))


def _model():
    return MaskRCNN(backbone=ViTAdapter(**TINY_BACKBONE), num_classes=5,
                    fpn_channels=32, num_proposals_test=50,
                    num_proposals_train=50, num_roi_samples=16, max_dets=10)


def _gt(B=1, G=4, H=64, W=64):
    rng = np.random.RandomState(0)
    xy = rng.rand(B, G, 2) * 30
    wh = rng.rand(B, G, 2) * 20 + 8
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    labels = rng.randint(0, 5, (B, G)).astype(np.int32)
    masks = np.zeros((B, G, H, W), np.float32)
    for b in range(B):
        for g in range(G):
            x1, y1, x2, y2 = boxes[b, g].astype(int)
            masks[b, g, y1:y2, x1:x2] = 1
    valid = np.asarray([[True, True, True, False]] * B)
    return (jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(masks),
            jnp.asarray(valid))


def test_mask_rcnn_inference_shapes():
    model = _model()
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(1), img)
    out = jax.jit(model.apply)(vars_, img)
    assert out["boxes"].shape == (1, 10, 4)
    assert out["scores"].shape == (1, 10)
    assert out["labels"].shape == (1, 10)
    assert out["masks"].shape == (1, 10, 28, 28)
    m = np.asarray(out["masks"])
    assert np.isfinite(m).all() and (m >= 0).all() and (m <= 1).all()


def test_mask_rcnn_train_losses_and_grads():
    model = _model()
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(1), img)
    gtb, gtl, gtm, gtv = _gt()

    def loss_fn(params):
        losses, _ = model.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            img, train=True, gt_boxes=gtb, gt_labels=gtl, gt_masks=gtm,
            gt_valid=gtv, rng=jax.random.PRNGKey(2),
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(3)})
        return losses["loss"], losses

    (loss, logs), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(vars_["params"])
    assert np.isfinite(float(loss))
    for k in ("loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox",
              "loss_mask"):
        assert np.isfinite(float(logs[k])), k
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert max(float(np.abs(np.asarray(g)).max()) for g in leaves) > 0
