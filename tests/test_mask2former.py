"""Mask2Former stack tests: point sampling, matching, head, loss."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vitadapter.heads.mask2former import Mask2FormerHead
from vitadapter.heads.mask2former_loss import (
    mask2former_loss,
    present_classes,
    sample_gt_points,
)
from vitadapter.heads.pixel_decoder import MSDeformAttnPixelDecoder
from vitadapter.layers.positional import sine_positional_encoding
from vitadapter.ops.matching import (
    bce_mask_cost,
    classification_cost,
    dice_cost,
    hungarian_assign,
)
from vitadapter.ops.point_sample import get_uncertain_point_coords, point_sample


def test_point_sample_matches_grid_sample():
    rng = np.random.RandomState(0)
    masks = rng.randn(3, 7, 9).astype(np.float32)
    pts = rng.rand(3, 11, 2).astype(np.float32)
    ours = point_sample(jnp.asarray(masks), jnp.asarray(pts))
    # torch point_sample semantics: grid_sample on [0,1]*2-1 coords
    g = torch.from_numpy(pts) * 2 - 1
    ref = F.grid_sample(torch.from_numpy(masks)[:, None], g[:, None],
                        mode="bilinear", padding_mode="zeros",
                        align_corners=False)[:, 0, 0]
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_sample_gt_points_equals_onehot_mask_sampling():
    rng = np.random.RandomState(1)
    label = rng.randint(0, 5, (2, 8, 8)).astype(np.int32)
    label[0, :2] = 255  # ignore region belongs to no class
    pts = rng.rand(2, 6, 2).astype(np.float32)
    gt_labels = jnp.asarray([[0, 1, 2], [3, 4, 0]], jnp.int32)
    ours = sample_gt_points(jnp.asarray(label), jnp.asarray(pts), gt_labels)
    for b in range(2):
        for g in range(3):
            mask = (label[b] == int(gt_labels[b, g])).astype(np.float32)
            ref = point_sample(jnp.asarray(mask[None]),
                               jnp.asarray(pts[b][None]))[0]
            np.testing.assert_allclose(np.asarray(ours[b, g]), np.asarray(ref),
                                       rtol=1e-4, atol=1e-5)


def test_present_classes():
    label = jnp.asarray([[[0, 2], [2, 255]], [[5, 5], [5, 5]]], jnp.int32)
    labels, valid = present_classes(label, num_classes=6, max_instances=3)
    assert labels.shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(labels[0, :2]), [0, 2])
    np.testing.assert_array_equal(np.asarray(valid[0]), [True, True, False])
    np.testing.assert_array_equal(np.asarray(labels[1, :1]), [5])
    np.testing.assert_array_equal(np.asarray(valid[1]), [True, False, False])


def test_hungarian_matches_scipy():
    from scipy.optimize import linear_sum_assignment
    rng = np.random.RandomState(0)
    cost = rng.randn(2, 5, 4).astype(np.float32)
    n_valid = np.asarray([4, 2], np.int32)
    # impl pinned: under the 8-device conftest mesh 'auto' dispatches to the
    # auction (exact-scipy equality is the callback path's contract)
    out = np.asarray(hungarian_assign(jnp.asarray(cost), jnp.asarray(n_valid),
                                      impl="callback"))
    for b, n in enumerate(n_valid):
        rows, cols = linear_sum_assignment(cost[b, :, :n])
        expect = np.full(5, -1)
        expect[rows] = cols
        np.testing.assert_array_equal(out[b], expect)


def test_costs_match_naive_loops():
    rng = np.random.RandomState(0)
    Q, G, P, K = 4, 3, 16, 5
    cls_logits = jnp.asarray(rng.randn(Q, K + 1), jnp.float32)
    labels = jnp.asarray([0, 2, 4], jnp.int32)
    pred = jnp.asarray(rng.randn(Q, P), jnp.float32)
    gt = jnp.asarray((rng.rand(G, P) > 0.5), jnp.float32)

    c = np.asarray(classification_cost(cls_logits, labels, 2.0))
    soft = np.asarray(jax.nn.softmax(cls_logits, -1))
    for q in range(Q):
        for g in range(G):
            np.testing.assert_allclose(c[q, g], -2.0 * soft[q, labels[g]],
                                       rtol=1e-5)

    cm = np.asarray(bce_mask_cost(pred, gt, 5.0))
    p = np.asarray(pred)
    gnp = np.asarray(gt)
    for q in range(Q):
        for g in range(G):
            bce = np.logaddexp(0, -p[q]) * gnp[g] + np.logaddexp(0, p[q]) * (1 - gnp[g])
            np.testing.assert_allclose(cm[q, g], 5.0 * bce.mean(), rtol=1e-4)

    cd = np.asarray(dice_cost(pred, gt, 5.0))
    sig = 1 / (1 + np.exp(-p))
    for q in range(Q):
        for g in range(G):
            d = 1 - (2 * (sig[q] * gnp[g]).sum() + 1) / (sig[q].sum() + gnp[g].sum() + 1)
            np.testing.assert_allclose(cd[q, g], 5.0 * d, rtol=1e-4)


def test_sine_positional_encoding_properties():
    pe = sine_positional_encoding((6, 8), 16)
    assert pe.shape == (6, 8, 32)
    a = np.asarray(pe)
    assert np.abs(a).max() <= 1.0 + 1e-6
    # distinct positions -> distinct codes
    flat = a.reshape(-1, 32)
    assert len(np.unique(flat.round(5), axis=0)) == 48
    # first half encodes y: constant along a row
    np.testing.assert_allclose(a[2, 0, :16], a[2, 5, :16], atol=1e-6)
    # second half encodes x: constant along a column
    np.testing.assert_allclose(a[0, 3, 16:], a[4, 3, 16:], atol=1e-6)


def _tiny_head(num_classes=7, C=32):
    return Mask2FormerHead(
        num_classes=num_classes, num_queries=5, feat_channels=C,
        out_channels=C, num_heads=4, num_decoder_layers=3,
        decoder_ffn_dim=64, pixel_encoder_ffn_dim=64, pixel_encoder_heads=4)


def _tiny_feats(B=1, C=32):
    return [jnp.asarray(np.random.RandomState(i).randn(B, s, s, C), jnp.float32)
            for i, s in enumerate((16, 8, 4, 2))]


def test_pixel_decoder_shapes():
    pd = MSDeformAttnPixelDecoder(feat_channels=32, out_channels=32,
                                  num_layers=2, num_heads=4, ffn_dim=64,
                                  num_feats=16)
    feats = _tiny_feats()
    vars_ = jax.jit(pd.init)(jax.random.PRNGKey(0), feats)
    mask_feat, mems = jax.jit(pd.apply)(vars_, feats)
    assert mask_feat.shape == (1, 16, 16, 32)
    assert [m.shape for m in mems] == [(1, 2, 2, 32), (1, 4, 4, 32),
                                       (1, 8, 8, 32)]


def test_mask2former_head_forward_and_semantic():
    head = _tiny_head()
    feats = _tiny_feats()
    vars_ = jax.jit(head.init)(jax.random.PRNGKey(0), feats)
    cls_list, mask_list = jax.jit(head.apply)(vars_, feats)
    assert len(cls_list) == 4 and len(mask_list) == 4  # layers + initial
    assert cls_list[-1].shape == (1, 5, 8)
    assert mask_list[-1].shape == (1, 5, 16, 16)
    seg = Mask2FormerHead.semantic_inference(cls_list[-1], mask_list[-1])
    assert seg.shape == (1, 16, 16, 7)
    a = np.asarray(seg)
    # sum over queries of prob*sigmoid: non-negative, bounded by num_queries
    assert (a >= 0).all() and (a <= 5.0).all()


def test_mask2former_loss_runs_and_grads():
    head = _tiny_head()
    feats = _tiny_feats()
    vars_ = jax.jit(head.init)(jax.random.PRNGKey(0), feats)
    label_map = jnp.asarray(
        np.random.RandomState(0).randint(0, 7, (1, 64, 64)), jnp.int32)

    def loss_fn(params):
        cls_list, mask_list = head.apply({"params": params}, feats, train=True)
        loss, logs = mask2former_loss(
            jax.random.PRNGKey(1), cls_list, mask_list, label_map,
            num_classes=7, max_instances=8, num_points=32)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(vars_["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert max(float(np.abs(np.asarray(g)).max()) for g in leaves) > 0


def test_mask2former_loss_empty_gt_no_nan():
    """All-ignore label map: only the classification (background) term."""
    head = _tiny_head()
    feats = _tiny_feats()
    vars_ = jax.jit(head.init)(jax.random.PRNGKey(0), feats)
    label_map = jnp.full((1, 64, 64), 255, jnp.int32)
    cls_list, mask_list = jax.jit(head.apply)(vars_, feats)
    loss, logs = jax.jit(lambda r, c, m, l: mask2former_loss(
        r, c, m, l, num_classes=7, max_instances=8, num_points=32))(
        jax.random.PRNGKey(1), cls_list, mask_list, label_map)
    assert np.isfinite(float(loss))
    assert float(logs["loss_dice"]) == 0.0


def test_uncertain_point_coords():
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8), jnp.float32)
    pts = get_uncertain_point_coords(jax.random.PRNGKey(0), logits, 16, 2.0, 0.5)
    assert pts.shape == (2, 16, 2)
    a = np.asarray(pts)
    assert (a >= 0).all() and (a <= 1).all()
