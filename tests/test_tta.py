"""Segmentation TTA integration: slide + Mask2Former, multi-scale flip."""

import jax
import jax.numpy as jnp
import numpy as np

from vitadapter.models.segmentor import multi_scale_flip_aug, slide_inference
from vitadapter.zoo import mask2former_vit_adapter


def _tiny_m2f():
    return mask2former_vit_adapter(
        "tiny", num_classes=7, num_queries=5,
        embed_dim=48, num_heads=4, deform_num_heads=4, conv_inplane=16,
        interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))


def test_slide_inference_with_mask2former():
    model = _tiny_m2f()
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(1), img)

    def logits_fn(crop):
        return model.apply(vars_, crop)

    big = jax.random.normal(jax.random.PRNGKey(2), (1, 48, 64, 3))
    out = slide_inference(logits_fn, big, (32, 32), (21, 21), 7)
    assert out.shape == (1, 48, 64, 7)
    assert np.isfinite(np.asarray(out)).all()


def test_multi_scale_flip_aug_mask2former():
    model = _tiny_m2f()
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(1), img)

    def logits_fn(x):
        return model.apply(vars_, x)

    out = multi_scale_flip_aug(logits_fn, img, 7, ratios=(0.5, 1.0),
                               flip=True)
    assert out.shape == (1, 64, 64, 7)
    a = np.asarray(out)
    assert np.isfinite(a).all()
    # averaged softmax fields sum to ~1 over classes
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-3)
