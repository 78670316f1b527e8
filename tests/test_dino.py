"""DINO stack tests: sine embed, CDN mask structure, losses, end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from vitadapter.det.dino import cdn_queries, sine_embed_coords
from vitadapter.det.dino_detector import DINO
from vitadapter.det.losses import (cxcywh_to_xyxy, giou, giou_pairwise,
                                   inverse_sigmoid, sigmoid_focal_loss,
                                   xyxy_to_cxcywh)
from vitadapter.models.vit_adapter import ViTAdapter

TINY_BACKBONE = dict(patch_size=16, embed_dim=48, depth=4, num_heads=4,
                     deform_num_heads=4, conv_inplane=16,
                     interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))


def test_box_conversions_roundtrip():
    rng = np.random.RandomState(0)
    b = jnp.asarray(rng.rand(10, 4) * 0.5 + jnp.asarray([0.1, 0.1, 0.2, 0.2]))
    back = xyxy_to_cxcywh(cxcywh_to_xyxy(b))
    np.testing.assert_allclose(np.asarray(back), np.asarray(b), atol=1e-6)


def test_giou_properties():
    a = jnp.asarray([[0., 0., 10., 10.]])
    assert abs(float(giou(a, a)[0]) - 1.0) < 1e-6
    far = jnp.asarray([[100., 100., 110., 110.]])
    assert float(giou(a, far)[0]) < 0
    m = giou_pairwise(jnp.concatenate([a, far]), jnp.concatenate([a, far]))
    np.testing.assert_allclose(np.diag(np.asarray(m)), 1.0, atol=1e-6)


def test_focal_loss_zero_for_confident_correct():
    logits = jnp.asarray([10.0, -10.0])
    targets = jnp.asarray([1.0, 0.0])
    assert float(sigmoid_focal_loss(logits, targets).sum()) < 1e-4


def test_inverse_sigmoid():
    x = jnp.asarray([0.1, 0.5, 0.9])
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(inverse_sigmoid(x))),
                               np.asarray(x), atol=1e-5)


def test_sine_embed_shape():
    e = sine_embed_coords(jnp.zeros((2, 5, 4)), 64)
    assert e.shape == (2, 5, 256)


def test_cdn_structure():
    B, G, num_groups, C, K, M = 2, 3, 2, 16, 5, 10
    rng = jax.random.PRNGKey(0)
    labels = jnp.asarray([[0, 1, 2], [3, 4, 0]], jnp.int32)
    boxes = jnp.tile(jnp.asarray([0.5, 0.5, 0.2, 0.2]), (B, G, 1))
    valid = jnp.asarray([[True, True, False], [True, False, False]])
    embed = jnp.asarray(np.random.RandomState(0).randn(K, C), jnp.float32)
    dn = cdn_queries(rng, labels, boxes, valid, embed, num_groups, K, M)
    n_dn = 2 * G * num_groups
    assert dn.queries.shape == (B, n_dn, C)
    assert dn.attn_mask.shape == (n_dn + M, n_dn + M)
    am = np.asarray(dn.attn_mask)
    # matching queries cannot see dn queries
    assert am[n_dn:, :n_dn].all()
    # matching queries see each other
    assert not am[n_dn:, n_dn:].any()
    # within-group visible, across groups masked
    assert not am[0, 2 * G - 1]
    assert am[0, 2 * G]
    # positives are valid gts in the first half of each group
    assert np.asarray(dn.is_pos)[0, :G].tolist() == [True, True, False]
    assert not np.asarray(dn.is_pos)[0, G:2 * G].any()
    # boxes stay normalized
    assert (np.asarray(dn.refs) >= 0).all() and (np.asarray(dn.refs) <= 1).all()


def _gt(B=1, G=3):
    rng = np.random.RandomState(0)
    xy = rng.rand(B, G, 2) * 20
    wh = rng.rand(B, G, 2) * 20 + 8
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    labels = rng.randint(0, 5, (B, G)).astype(np.int32)
    valid = np.ones((B, G), bool)
    return jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid)


def test_dino_inference_and_train():
    model = DINO(backbone=ViTAdapter(**TINY_BACKBONE), num_classes=5,
                 num_queries=20, embed_dim=32, num_heads=4, ffn_dim=64,
                 num_encoder_layers=2, num_decoder_layers=2, dn_groups=1,
                 max_dets=10)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(1), img)
    out = jax.jit(model.apply)(vars_, img)
    assert out["boxes"].shape == (1, 10, 4)
    assert np.isfinite(np.asarray(out["scores"])).all()

    gtb, gtl, gtv = _gt()

    def loss_fn(p):
        losses, _ = model.apply(
            {"params": p, "batch_stats": vars_["batch_stats"]}, img,
            train=True, gt_boxes=gtb, gt_labels=gtl, gt_valid=gtv,
            rng=jax.random.PRNGKey(2), mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(3)})
        return losses["loss"], losses

    (loss, logs), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(vars_["params"])
    assert np.isfinite(float(loss))
    for k in ("loss_cls", "loss_bbox", "loss_iou", "loss_cls_dn",
              "enc.loss_cls"):
        assert np.isfinite(float(logs[k])), k
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
