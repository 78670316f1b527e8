"""UniPerceiver trunk + adapter + GroundingDINO tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vitadapter.det.grounding_dino import GroundingDINO, aug_test_vote
from vitadapter.models.uniperceiver import (MultiModelBertLayer,
                                            UnifiedBertEncoder)
from vitadapter.models.uniperceiver_adapter import UniPerceiverAdapter

TINY = dict(patch_size=16, embed_dim=48, depth=4, num_heads=4,
            vocab_size=100)


def test_unified_bert_encoder_shapes():
    model = UnifiedBertEncoder(**TINY)
    img = jnp.zeros((2, 64, 64, 3))
    ids = jnp.zeros((2, 7), jnp.int32)
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(0), img, ids)
    x, q = jax.jit(model.apply)(vars_, img, ids)
    assert x.shape == (2, 16, 48)
    assert q.shape == (2, 7, 48)


def test_text_mask_blocks_padded_tokens():
    """Padded text tokens must not influence image outputs."""
    layer = MultiModelBertLayer(num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 9, 32))
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 32))
    mask = jnp.asarray([[1, 1, 0, 0]])
    vars_ = layer.init(jax.random.PRNGKey(2), x, q, mask, 3, 3)
    x1, _ = layer.apply(vars_, x, q, mask, 3, 3)
    q2 = q.at[:, 2:].set(123.0)  # perturb only padded tokens
    x2, _ = layer.apply(vars_, x, q2, mask, 3, 3)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)


def test_windowed_joint_attention_runs():
    layer = MultiModelBertLayer(num_heads=4, windowed=True, window_size=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32))
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 32))
    mask = jnp.ones((1, 3), jnp.int32)
    vars_ = layer.init(jax.random.PRNGKey(2), x, q, mask, 4, 4)
    x1, q1 = layer.apply(vars_, x, q, mask, 4, 4)
    assert x1.shape == x.shape and q1.shape == q.shape
    assert np.isfinite(np.asarray(x1)).all()


def _adapter():
    return UniPerceiverAdapter(
        patch_size=16, embed_dim=48, depth=4, num_heads=4, vocab_size=100,
        deform_num_heads=4, conv_inplane=16,
        interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)),
        num_grounding_blocks=1)


def test_uniperceiver_adapter_shapes():
    model = _adapter()
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    ids = jnp.zeros((1, 5), jnp.int32)
    mask = jnp.ones((1, 5), jnp.int32)
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(1), img, ids, mask)
    feats = jax.jit(model.apply)(vars_, img, ids, mask)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 48), (1, 8, 8, 48), (1, 4, 4, 48), (1, 2, 2, 48)]


def test_grounding_dino_infer_and_train():
    model = GroundingDINO(backbone=_adapter(), num_classes=1, num_queries=12,
                          embed_dim=32, num_heads=4, ffn_dim=64,
                          num_encoder_layers=1, num_decoder_layers=2,
                          dn_groups=1, max_dets=5)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    ids = jnp.zeros((1, 5), jnp.int32)
    mask = jnp.ones((1, 5), jnp.int32)
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(1), img, ids, mask)
    out = jax.jit(model.apply)(vars_, img, ids, mask)
    assert out["boxes"].shape == (1, 5, 4)

    gtb = jnp.asarray([[[8., 8., 40., 40.]]])
    gtl = jnp.zeros((1, 1), jnp.int32)
    gtv = jnp.ones((1, 1), bool)

    def loss_fn(p):
        losses, _ = model.apply(
            {"params": p, "batch_stats": vars_["batch_stats"]}, img, ids,
            mask, train=True, gt_boxes=gtb, gt_labels=gtl, gt_valid=gtv,
            rng=jax.random.PRNGKey(2), mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(3)})
        return losses["loss"]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(vars_["params"])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_aug_test_vote_prefers_consensus():
    # three overlapping boxes + one high-score outlier
    r1 = {"boxes": np.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32),
          "scores": np.asarray([0.8, 0.85], np.float32)}
    r2 = {"boxes": np.asarray([[1, 1, 10, 10]], np.float32),
          "scores": np.asarray([0.8], np.float32)}
    r3 = {"boxes": np.asarray([[0, 0, 11, 10]], np.float32),
          "scores": np.asarray([0.75], np.float32)}
    best = aug_test_vote([r1, r2, r3])
    assert best[2] <= 12  # the consensus cluster, not the outlier
