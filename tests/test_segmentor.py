"""End-to-end segmentor tests: UperNet head, slide inference, losses, metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vitadapter.heads.upernet import UPerHead, FCNHead, adaptive_avg_pool
from vitadapter.models.segmentor import (
    EncoderDecoder, slide_inference, _slide_grid,
    cross_entropy_loss, segmentation_loss, flip_tta,
)
from vitadapter.models.vit_adapter import ViTAdapter
from vitadapter.data.metrics import confusion_matrix, miou_from_confusion

TINY = dict(patch_size=16, embed_dim=48, depth=4, num_heads=4,
            deform_num_heads=4, conv_inplane=16,
            interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))


def test_adaptive_avg_pool_matches_torch():
    rng = np.random.RandomState(0)
    for hw, o in [((7, 9), 3), ((16, 16), 6), ((5, 5), 1), ((6, 4), 2)]:
        x = rng.randn(2, *hw, 3).astype(np.float32)
        ours = adaptive_avg_pool(jnp.asarray(x), o)
        ref = F.adaptive_avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), o)
        np.testing.assert_allclose(np.asarray(ours),
                                   ref.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-5, atol=1e-6)


def test_upernet_head_shapes():
    head = UPerHead(num_classes=19, channels=64)
    feats = [jnp.zeros((2, 16, 16, 48)), jnp.zeros((2, 8, 8, 48)),
             jnp.zeros((2, 4, 4, 48)), jnp.zeros((2, 2, 2, 48))]
    vars_ = head.init(jax.random.PRNGKey(0), feats)
    out = head.apply(vars_, feats)
    assert out.shape == (2, 16, 16, 19)


def test_slide_grid():
    # 512 crop, 341 stride over 683 -> starts [0, 171]; over 512 -> [0]
    assert _slide_grid(512, 512, 341) == [0]
    assert _slide_grid(683, 512, 341) == [0, 171]
    assert _slide_grid(1024, 512, 341) == [0, 341, 512]


def test_slide_equals_whole_for_small_image():
    """When the image fits in one crop, slide == whole inference."""
    K = 7

    def logits_fn(img):
        # deterministic pseudo-head: K channel mixes of the input
        B, H, W, _ = img.shape
        w = jnp.arange(3 * K, dtype=jnp.float32).reshape(3, K)
        return img @ w

    img = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    out = slide_inference(logits_fn, img, (32, 32), (21, 21), K)
    np.testing.assert_allclose(np.asarray(out), np.asarray(logits_fn(img)),
                               rtol=1e-5, atol=1e-6)


def test_slide_overlap_average_translation_invariant_head():
    """With a pointwise head, overlapping windows must not change the result."""
    K = 4

    def logits_fn(img):
        w = jnp.ones((3, K), jnp.float32)
        return img @ w

    img = jax.random.normal(jax.random.PRNGKey(1), (1, 48, 80, 3))
    out = slide_inference(logits_fn, img, (32, 32), (16, 16), K)
    np.testing.assert_allclose(np.asarray(out), np.asarray(logits_fn(img)),
                               rtol=1e-5, atol=1e-5)


def test_cross_entropy_ignore_and_mean():
    logits = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 3), jnp.float32)
    labels = jnp.full((1, 4, 4), 255, jnp.int32).at[0, 0, 0].set(1)
    loss = cross_entropy_loss(logits, labels)
    expected = -jax.nn.log_softmax(logits[0, 0, 0])[1]
    np.testing.assert_allclose(float(loss), float(expected), rtol=1e-6)
    # all-ignored -> zero loss, no NaN
    loss0 = cross_entropy_loss(logits, jnp.full((1, 4, 4), 255, jnp.int32))
    assert float(loss0) == 0.0


def test_confusion_and_miou():
    pred = jnp.asarray([[0, 1], [1, 2]])
    label = jnp.asarray([[0, 1], [2, 255]])
    cm = confusion_matrix(pred, label, 3)
    assert int(cm[0, 0]) == 1 and int(cm[1, 1]) == 1 and int(cm[2, 1]) == 1
    m = miou_from_confusion(np.asarray(cm))
    np.testing.assert_allclose(m["aAcc"], 2 / 3, rtol=1e-6)
    # class0 IoU=1, class1 IoU=1/2, class2 IoU=0 -> mIoU=0.5
    np.testing.assert_allclose(m["mIoU"], 0.5, rtol=1e-6)


def test_encoder_decoder_train_and_infer():
    model = EncoderDecoder(
        backbone=ViTAdapter(**TINY),
        decode_head=UPerHead(num_classes=11, channels=32),
        auxiliary_head=FCNHead(num_classes=11, channels=16),
    )
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    vars_ = jax.jit(lambda k, x: model.init(k, x, with_aux=True))(
        jax.random.PRNGKey(1), img)
    # inference
    logits = jax.jit(model.apply)(vars_, img)
    assert logits.shape == (1, 32, 32, 11)
    # training loss + grads
    labels = jnp.zeros((1, 32, 32), jnp.int32)

    def loss_fn(p):
        (lg, ax), _ = model.apply(
            {"params": p, "batch_stats": vars_["batch_stats"]}, img,
            train=True, with_aux=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)})
        loss, logs = segmentation_loss(lg, ax, labels)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(vars_["params"])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_flip_tta_equivariant_head_is_identity():
    """For a flip-equivariant head (f(flip x) = flip f(x)), TTA == plain."""

    def logits_fn(img):
        w = jnp.arange(3 * 5, dtype=jnp.float32).reshape(3, 5)
        return img @ w  # pointwise => flip-equivariant

    img = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 6, 3))
    out = flip_tta(logits_fn)(img)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jax.nn.softmax(logits_fn(img), -1)),
                               rtol=1e-6, atol=1e-6)
