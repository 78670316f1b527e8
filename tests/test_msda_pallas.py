"""Pallas MSDA kernel parity (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitadapter.ops.msda import ms_deform_attn_block


def test_pallas_kernel_matches_block_interpret():
    from jax.experimental.pallas import tpu as pltpu

    from vitadapter.ops import msda_pallas

    rng = np.random.RandomState(0)
    shapes = ((8, 6), (4, 3))
    S = sum(h * w for h, w in shapes)
    B, Lq, M, D, P = 1, 5, 2, 32, 4
    value = jnp.asarray(rng.randn(B, S, M, D), jnp.float32)
    loc = jnp.asarray((rng.rand(B, Lq, M, 2, P, 2) - 0.25) * 2.0, jnp.float32)
    attn = jnp.asarray(rng.rand(B, Lq, M, 2, P), jnp.float32)
    ref = ms_deform_attn_block(value, shapes, loc, attn)
    with pltpu.force_tpu_interpret_mode():
        got = msda_pallas.ms_deform_attn_pallas(value, shapes, loc, attn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_backward_matches_block_vjp_interpret():
    """custom_vjp backward: Pallas grad_value contraction kernel + XLA
    dloc/dattn must match the pure XLA block VJP."""
    from jax.experimental.pallas import tpu as pltpu

    from vitadapter.ops import msda_pallas

    rng = np.random.RandomState(1)
    shapes = ((8, 6), (4, 3))
    S = sum(h * w for h, w in shapes)
    B, Lq, M, D, P = 2, 5, 2, 32, 4
    value = jnp.asarray(rng.randn(B, S, M, D), jnp.float32)
    loc = jnp.asarray((rng.rand(B, Lq, M, 2, P, 2) - 0.25) * 2.0, jnp.float32)
    attn = jnp.asarray(rng.rand(B, Lq, M, 2, P), jnp.float32)

    def loss(fn):
        return lambda v, l, a: jnp.sum(fn(v, shapes, l, a) ** 2)

    ref = jax.grad(loss(ms_deform_attn_block), argnums=(0, 1, 2))(
        value, loc, attn)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss(msda_pallas.ms_deform_attn_pallas),
                       argnums=(0, 1, 2))(value, loc, attn)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_query_segments_fwd_bwd_interpret():
    """query_segments (pixel-decoder grid-structured queries) is a pure
    perf hint: forward and every gradient must be bit-comparable to the
    unsegmented path and match the XLA block VJP."""
    from jax.experimental.pallas import tpu as pltpu

    from vitadapter.ops import msda_pallas

    rng = np.random.RandomState(2)
    shapes = ((8, 8), (4, 4), (2, 2))
    S = sum(h * w for h, w in shapes)
    segs = tuple(h * w for h, w in shapes)   # queries = concat of levels
    B, M, D, P = 1, 2, 32, 4
    Lq = S
    value = jnp.asarray(rng.randn(B, S, M, D), jnp.float32)
    loc = jnp.asarray((rng.rand(B, Lq, M, 3, P, 2) - 0.25) * 2.0, jnp.float32)
    attn = jnp.asarray(rng.rand(B, Lq, M, 3, P), jnp.float32)

    def loss(fn, **kw):
        return lambda v, l, a: jnp.sum(fn(v, shapes, l, a, **kw) ** 2)

    ref_out = ms_deform_attn_block(value, shapes, loc, attn)
    ref_g = jax.grad(loss(ms_deform_attn_block), argnums=(0, 1, 2))(
        value, loc, attn)
    with pltpu.force_tpu_interpret_mode():
        got_out = msda_pallas.ms_deform_attn_pallas(
            value, shapes, loc, attn, segs)
        got_g = jax.grad(
            loss(msda_pallas.ms_deform_attn_pallas, query_segments=segs),
            argnums=(0, 1, 2))(value, loc, attn)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-5)
    for g, r in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)
