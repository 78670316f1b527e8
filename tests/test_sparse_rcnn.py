"""Sparse R-CNN tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vitadapter.det.sparse_rcnn import DynamicConv, SparseRCNN
from vitadapter.models.vit_adapter import ViTAdapter

TINY_BACKBONE = dict(patch_size=16, embed_dim=48, depth=4, num_heads=4,
                     deform_num_heads=4, conv_inplane=16,
                     interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))


def test_dynamic_conv_shapes():
    dc = DynamicConv(channels=32, inner=8, out_flat=32)
    roi = jax.random.normal(jax.random.PRNGKey(0), (5, 49, 32))
    prop = jax.random.normal(jax.random.PRNGKey(1), (5, 32))
    vars_ = dc.init(jax.random.PRNGKey(2), roi, prop)
    out = dc.apply(vars_, roi, prop)
    assert out.shape == (5, 32)
    # different proposal features produce different interactions
    out2 = dc.apply(vars_, roi, prop + 1.0)
    assert np.abs(np.asarray(out - out2)).max() > 1e-3


def test_sparse_rcnn_end_to_end():
    model = SparseRCNN(backbone=ViTAdapter(**TINY_BACKBONE), num_classes=4,
                       num_proposals=10, num_stages=2, channels=32,
                       max_dets=6)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(1), img)
    out = jax.jit(model.apply)(vars_, img)
    assert out["boxes"].shape == (1, 6, 4)
    assert np.isfinite(np.asarray(out["scores"])).all()

    gtb = jnp.asarray([[[4., 4., 40., 40.]]])
    gtl = jnp.zeros((1, 1), jnp.int32)
    gtv = jnp.ones((1, 1), bool)

    def loss_fn(p):
        losses, _ = model.apply(
            {"params": p, "batch_stats": vars_["batch_stats"]}, img,
            train=True, gt_boxes=gtb, gt_labels=gtl, gt_valid=gtv,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)})
        return losses["loss"]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(vars_["params"])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
