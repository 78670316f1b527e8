"""Structural and invariant tests for the ViT backbone + adapter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.core import FrozenDict

from vitadapter.layers.attention import Attention, WindowedAttention
from vitadapter.models.adapter import SpatialPriorModule, deform_inputs
from vitadapter.models.vit import TIMMVisionTransformer
from vitadapter.models.vit_adapter import ViTAdapter


def test_windowed_equals_global_when_window_covers_image():
    """A single window spanning the whole image must equal global attention."""
    B, H, W, C, heads = 2, 7, 7, 32, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H * W, C))
    glob = Attention(num_heads=heads, qkv_bias=True)
    win = WindowedAttention(num_heads=heads, qkv_bias=True, window_size=7)
    params = glob.init(jax.random.PRNGKey(1), x, H, W)
    out_g = glob.apply(params, x, H, W)
    out_w = win.apply(params, x, H, W)  # same param structure (qkv, proj)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_g),
                               rtol=1e-5, atol=1e-5)


def test_windowed_attention_is_window_local():
    """Perturbing one window must not change other windows' outputs."""
    B, H, W, C, ws = 1, 8, 8, 16, 4
    win = WindowedAttention(num_heads=2, qkv_bias=True, window_size=ws)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H * W, C))
    params = win.init(jax.random.PRNGKey(1), x, H, W)
    out0 = np.asarray(win.apply(params, x, H, W)).reshape(H, W, C)
    x2 = x.at[:, 0].add(10.0)  # perturb top-left window only
    out1 = np.asarray(win.apply(params, x2, H, W)).reshape(H, W, C)
    # bottom-right window untouched
    np.testing.assert_allclose(out0[4:, 4:], out1[4:, 4:], atol=1e-6)
    assert np.abs(out0[:4, :4] - out1[:4, :4]).max() > 1e-3


def test_windowed_attention_non_divisible_padding():
    """H, W not divisible by window size: output is finite and shaped."""
    B, H, W, C = 1, 10, 13, 16
    win = WindowedAttention(num_heads=2, qkv_bias=True, window_size=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H * W, C))
    params = win.init(jax.random.PRNGKey(1), x, H, W)
    out = win.apply(params, x, H, W)
    assert out.shape == (B, H * W, C)
    assert np.isfinite(np.asarray(out)).all()


def test_spm_shapes():
    spm = SpatialPriorModule(inplanes=16, embed_dim=48)
    x = jnp.zeros((2, 64, 96, 3))
    vars_ = spm.init(jax.random.PRNGKey(0), x)
    c1, c2, c3, c4 = spm.apply(vars_, x)
    assert c1.shape == (2, 16, 24, 48)      # stride 4, NHWC map
    assert c2.shape == (2, 8 * 12, 48)      # stride 8 tokens
    assert c3.shape == (2, 4 * 6, 48)       # stride 16
    assert c4.shape == (2, 2 * 3, 48)       # stride 32


def test_deform_inputs_geometry():
    (ref1, shapes1), (ref2, shapes2) = deform_inputs(64, 96)
    assert shapes1 == ((8, 12), (4, 6), (2, 3))
    assert shapes2 == ((4, 6),)
    assert ref1.shape == (1, 4 * 6, 1, 2)           # injector queries 16s grid
    assert ref2.shape == (1, 8 * 12 + 4 * 6 + 2 * 3, 1, 2)
    # first reference point of an 8x12 grid is the cell center (0.5/12, 0.5/8)
    np.testing.assert_allclose(np.asarray(ref2[0, 0, 0]),
                               [0.5 / 12, 0.5 / 8], atol=1e-6)


TINY = dict(patch_size=16, embed_dim=48, depth=4, num_heads=4,
            deform_num_heads=4, conv_inplane=16,
            interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)),
            deform_ratio=1.0, pretrain_size=224)


def test_vit_adapter_forward_shapes():
    model = ViTAdapter(**TINY)
    x = jnp.zeros((2, 64, 96, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(model.apply)(vars_, x)
    assert [f.shape for f in feats] == [
        (2, 16, 24, 48), (2, 8, 12, 48), (2, 4, 6, 48), (2, 2, 3, 48)]
    for f in feats:
        assert np.isfinite(np.asarray(f)).all()


def test_vit_adapter_train_mode_and_grads():
    model = ViTAdapter(**TINY, drop_path_rate=0.1)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(1), x)
    params, batch_stats = vars_["params"], vars_["batch_stats"]

    def loss_fn(p):
        feats, updates = model.apply(
            {"params": p, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)})
        return sum(jnp.mean(f**2) for f in feats)

    g = jax.jit(jax.grad(loss_fn))(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(v)).all() for v in flat)
    # injector gamma is zero-init, but gradients must flow to the ViT trunk
    leaves = jax.tree_util.tree_leaves_with_path(g)
    qkv_grads = [np.abs(np.asarray(v)).max() for p, v in leaves
                 if "qkv" in jax.tree_util.keystr(p)]
    assert max(qkv_grads) > 0


def test_vit_baseline_trunk_runs():
    vit = TIMMVisionTransformer(patch_size=16, embed_dim=48, depth=2,
                                num_heads=4, window_attn=[True, False],
                                window_size=[4, 14])
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = vit.init(jax.random.PRNGKey(0), x)
    out = vit.apply(vars_, x)
    assert out.shape == (1, 16, 48)


def test_vit_adapter_remat_path():
    """with_cp=True (gradient checkpointing) must produce finite grads."""
    model = ViTAdapter(patch_size=16, embed_dim=48, depth=2, num_heads=4,
                       deform_num_heads=4, conv_inplane=16, with_cp=True,
                       interaction_indexes=((0, 0), (1, 1)))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(1), x)

    def loss(p):
        feats, _ = model.apply(
            {"params": p, "batch_stats": vars_["batch_stats"]}, x,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)})
        return sum(jnp.mean(f ** 2) for f in feats)

    g = jax.jit(jax.grad(loss))(vars_["params"])
    assert all(np.isfinite(np.asarray(t)).all()
               for t in jax.tree_util.tree_leaves(g))
