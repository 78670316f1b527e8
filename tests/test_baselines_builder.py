"""Baseline backbones + registry builder."""

import jax
import jax.numpy as jnp
import numpy as np

from vitadapter.builder import build_model
from vitadapter.models.baselines import ViTBaseline


def test_vit_baseline_pyramid():
    model = ViTBaseline(patch_size=16, embed_dim=48, depth=2, num_heads=4)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(model.apply)(vars_, x)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 48), (1, 8, 8, 48), (1, 4, 4, 48), (1, 2, 2, 48)]


def test_builder_constructs_detector_from_dict():
    cfg = dict(
        type="MaskRCNN",
        num_classes=3,
        fpn_channels=32,
        num_proposals_test=20,
        max_dets=5,
        backbone=dict(type="ViTAdapter", patch_size=16, embed_dim=48,
                      depth=2, num_heads=4, deform_num_heads=4,
                      conv_inplane=16,
                      interaction_indexes=[[0, 0], [1, 1]]),
    )
    model = build_model(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(vars_, x)
    assert out["boxes"].shape == (1, 5, 4)


def test_builder_unknown_type_raises():
    import pytest
    with pytest.raises(KeyError):
        build_model(dict(type="NotAModel"))
