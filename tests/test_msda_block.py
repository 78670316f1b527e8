"""Block-gather MSDA must match the reference 4-corner formulation exactly
in fp32 (same bilinear math, different memory access pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitadapter.ops.msda import ms_deform_attn_block, ms_deform_attn_core


@pytest.mark.parametrize("spread", [1.0, 2.5])
def test_block_matches_reference(spread):
    rng = np.random.RandomState(0)
    shapes = ((8, 6), (4, 3), (2, 2))
    S = sum(h * w for h, w in shapes)
    B, Lq, M, D, P = 2, 9, 4, 16, 4
    value = jnp.asarray(rng.randn(B, S, M, D), jnp.float32)
    loc = jnp.asarray((rng.rand(B, Lq, M, 3, P, 2) - 0.25) * spread, jnp.float32)
    attn = jnp.asarray(rng.rand(B, Lq, M, 3, P), jnp.float32)
    ref = ms_deform_attn_core(value, shapes, loc, attn)
    got = ms_deform_attn_block(value, shapes, loc, attn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_block_gradients_match_reference():
    rng = np.random.RandomState(1)
    shapes = ((6, 4),)
    B, Lq, M, D, P = 1, 5, 2, 8, 3
    value = jnp.asarray(rng.randn(B, 24, M, D), jnp.float32)
    loc = jnp.asarray(rng.rand(B, Lq, M, 1, P, 2), jnp.float32)
    attn = jnp.asarray(rng.rand(B, Lq, M, 1, P), jnp.float32)

    def loss(fn, v, l, a):
        return jnp.sum(fn(v, shapes, l, a) ** 2)

    g_ref = jax.grad(lambda *a: loss(ms_deform_attn_core, *a),
                     argnums=(0, 1, 2))(value, loc, attn)
    g_blk = jax.grad(lambda *a: loss(ms_deform_attn_block, *a),
                     argnums=(0, 1, 2))(value, loc, attn)
    for a, b in zip(g_ref, g_blk):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
