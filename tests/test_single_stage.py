"""ATSS / GFL tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vitadapter.det.single_stage import (ATSS, atss_assign,
                                         centerness_target,
                                         distribution_focal_loss,
                                         gfl_integral, quality_focal_loss)
from vitadapter.models.vit_adapter import ViTAdapter

TINY_BACKBONE = dict(patch_size=16, embed_dim=48, depth=4, num_heads=4,
                     deform_num_heads=4, conv_inplane=16,
                     interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))


def test_centerness_center_is_one():
    anchors = jnp.asarray([[45., 45., 55., 55.]])
    gts = jnp.asarray([[0., 0., 100., 100.]])
    np.testing.assert_allclose(float(centerness_target(anchors, gts)[0]),
                               1.0, atol=1e-5)


def test_gfl_integral_and_dfl():
    # distribution peaked at bin 3 -> expected distance ~3
    logits = jnp.full((1, 4 * 17), -10.0)
    logits = logits.reshape(1, 4, 17).at[:, :, 3].set(10.0).reshape(1, -1)
    d = gfl_integral(logits, 16)
    np.testing.assert_allclose(np.asarray(d[0]), 3.0, atol=1e-3)
    # DFL is minimal when the distribution matches the target bins
    loss_match = distribution_focal_loss(logits, jnp.full((1, 4), 3.0), 16)
    loss_off = distribution_focal_loss(logits, jnp.full((1, 4), 8.0), 16)
    assert float(loss_match[0]) < float(loss_off[0])


def test_qfl_zero_when_confident_and_correct():
    logits = jnp.asarray([[10.0, -10.0]])
    loss_hi = quality_focal_loss(logits, jnp.asarray([0]), jnp.asarray([1.0]), 2)
    assert float(loss_hi[0]) < 1e-3


def test_atss_assign_prefers_centered_anchors():
    # anchors on a 4x4 grid of stride 16; one gt covering top-left corner
    from vitadapter.det.anchors import grid_anchors
    anc = jnp.asarray(grid_anchors((4, 4), 16, [8], [1.0]))
    gt = jnp.asarray([[0., 0., 40., 40.]])
    assigned = np.asarray(atss_assign(anc, [16], gt, jnp.asarray([True])))
    pos_idx = np.where(assigned == 0)[0]
    assert len(pos_idx) > 0
    centers = np.asarray((anc[:, :2] + anc[:, 2:]) / 2)
    assert (centers[pos_idx] < 40).all()


def _run_detector(reg_max):
    model = ATSS(backbone=ViTAdapter(**TINY_BACKBONE), num_classes=4,
                 fpn_channels=32, reg_max=reg_max, max_dets=8)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(1), img)
    out = jax.jit(model.apply)(vars_, img)
    assert out["boxes"].shape == (1, 8, 4)

    gtb = jnp.asarray([[[4., 4., 40., 40.], [20., 20., 60., 60.]]])
    gtl = jnp.asarray([[0, 2]], jnp.int32)
    gtv = jnp.ones((1, 2), bool)

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


def test_atss_end_to_end():
    _run_detector(reg_max=0)


def test_gfl_end_to_end():
    _run_detector(reg_max=16)
