"""Parity tests for the TPU MSDA op.

Test model: the reference kernel harness `detection/ops/test.py`, which checks
the CUDA op against a grid_sample-based functional oracle (forward allclose)
and runs numerical gradcheck across a channel sweep. Here the oracle is an
independently written torch (CPU) implementation of the same math —
grid_sample(bilinear, zeros, align_corners=False) + attention-weighted sum —
and gradients are cross-checked against torch autograd.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vitadapter.ops.msda import (
    ms_deform_attn_core,
    msda_grid_init,
    MSDeformAttn,
    level_start_index,
)


def torch_msda_oracle(value, spatial_shapes, sampling_locations, attention_weights):
    """Functional oracle using torch grid_sample (CPU).

    Same math as the reference check implementation
    (detection/ops/functions/ms_deform_attn_func.py:49-71).
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    splits = [h * w for h, w in spatial_shapes]
    value_list = value.split(splits, dim=1)
    grids = 2 * sampling_locations - 1
    sampled = []
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(B * M, D, H, W)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)  # (B*M, Lq, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)  # (B*M, D, Lq, P)
        sampled.append(s)
    attn = attention_weights.transpose(1, 2).reshape(B * M, 1, Lq, L * P)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * attn).sum(-1)
    return out.view(B, M * D, Lq).transpose(1, 2).contiguous()


def make_inputs(B=2, M=4, D=16, P=3, shapes=((6, 4), (3, 2)), Lq=5, seed=0,
                spread=2.0):
    """Random MSDA inputs. spread>1 pushes some samples out of bounds."""
    rng = np.random.RandomState(seed)
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = rng.randn(B, S, M, D).astype(np.float32)
    loc = (rng.rand(B, Lq, M, L, P, 2).astype(np.float32) - 0.25) * spread
    attn = rng.rand(B, Lq, M, L, P).astype(np.float32) + 1e-5
    attn = attn / attn.sum(axis=(3, 4), keepdims=True)
    return value, loc, attn


CHANNEL_SWEEP = [8, 16, 30, 32, 64, 71]


@pytest.mark.parametrize("D", CHANNEL_SWEEP)
def test_forward_matches_torch_oracle(D):
    shapes = ((6, 4), (3, 2))
    value, loc, attn = make_inputs(D=D, shapes=shapes, seed=D)
    ours = ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc),
                               jnp.asarray(attn))
    ref = torch_msda_oracle(torch.from_numpy(value), shapes,
                            torch.from_numpy(loc), torch.from_numpy(attn))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_forward_three_levels_large():
    shapes = ((16, 16), (8, 8), (4, 4))
    value, loc, attn = make_inputs(B=2, M=6, D=32, P=4, shapes=shapes, Lq=64, seed=7)
    ours = ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc),
                               jnp.asarray(attn))
    ref = torch_msda_oracle(torch.from_numpy(value), shapes,
                            torch.from_numpy(loc), torch.from_numpy(attn))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_out_of_bounds_samples_are_zero():
    shapes = ((4, 4),)
    value, loc, attn = make_inputs(B=1, M=2, D=8, P=2, shapes=shapes, Lq=3, seed=1)
    loc = np.full_like(loc, 5.0)  # all samples far outside [0, 1]
    out = ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc),
                              jnp.asarray(attn))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


def test_gradients_match_torch_autograd():
    shapes = ((6, 4), (3, 2))
    value, loc, attn = make_inputs(B=1, M=2, D=8, P=2, Lq=4, shapes=shapes, seed=3,
                                   spread=1.0)

    def loss_jax(v, l, a):
        out = ms_deform_attn_core(v, shapes, l, a)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    gv, gl, ga = jax.grad(loss_jax, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    ta = torch.from_numpy(attn).requires_grad_(True)
    out = torch_msda_oracle(tv, shapes, tl, ta)
    w = torch.cos(torch.arange(out.numel(), dtype=torch.float32).reshape(out.shape))
    (out * w).sum().backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-4, atol=1e-5)
    # grid_sample's location gradient at exact cell boundaries is subgradient —
    # inputs here stay off boundaries so this is well-defined.
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_grid_init_shape_and_symmetry():
    bias = msda_grid_init(8, 4, 4)
    assert bias.shape == (8 * 4 * 4 * 2,)
    g = np.asarray(bias).reshape(8, 4, 4, 2)
    # head 0 points along +x with Linf norm = point index + 1
    np.testing.assert_allclose(g[0, 0, :, 0], [1, 2, 3, 4], atol=1e-5)
    np.testing.assert_allclose(g[0, 0, :, 1], 0, atol=1e-5)
    # all levels share the same init
    np.testing.assert_allclose(g[:, 0], g[:, 1], atol=1e-6)


def test_msda_module_shapes_and_softmax_init():
    """With zero-init offset/weight kernels, attention is uniform softmax."""
    shapes = ((8, 8), (4, 4), (2, 2))
    S = sum(h * w for h, w in shapes)
    B, Lq, C = 2, 10, 48
    mod = MSDeformAttn(d_model=C, n_levels=3, n_heads=6, n_points=4, ratio=0.5)
    q = jnp.ones((B, Lq, C))
    feat = jax.random.normal(jax.random.PRNGKey(0), (B, S, C))
    ref = jnp.tile(jnp.array([[0.5, 0.5]]), (B * Lq * 3, 1)).reshape(B, Lq, 3, 2)
    params = mod.init(jax.random.PRNGKey(1), q, ref, feat, shapes)
    out = mod.apply(params, q, ref, feat, shapes)
    assert out.shape == (B, Lq, C)
    assert np.isfinite(np.asarray(out)).all()


def test_level_start_index():
    assert level_start_index(((6, 4), (3, 2), (1, 1))) == (0, 24, 30)
