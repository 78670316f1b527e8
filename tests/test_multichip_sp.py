"""Sequence (token) parallelism tests: MSDA queries sharded over the mesh,
value replicated (`vitadapter/parallel/sp.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vitadapter.ops.msda import ms_deform_attn
from vitadapter.parallel.sp import msda_token_sharded

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def _inputs():
    shapes = ((16, 16), (8, 8), (4, 4))
    S = sum(h * w for h, w in shapes)
    B, Lq, M, L, Pn, D = 2, 336, 4, 3, 4, 8
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, M, D), jnp.float32)
    loc = jnp.asarray(rng.rand(B, Lq, M, L, Pn, 2) * 1.2 - 0.1, jnp.float32)
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(B, Lq, M, L * Pn), jnp.float32)
    ).reshape(B, Lq, M, L, Pn)
    return shapes, value, loc, attn


def test_msda_token_sharded_matches_and_shards():
    shapes, value, loc, attn = _inputs()
    want = ms_deform_attn(value, shapes, loc, attn)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("model",))
    sh = NamedSharding(mesh, P(None, "model"))
    loc_s = jax.device_put(loc, sh)
    attn_s = jax.device_put(attn, sh)
    value_s = jax.device_put(value, NamedSharding(mesh, P()))

    got = jax.jit(lambda v, l, a: msda_token_sharded(
        v, shapes, l, a, mesh))(value_s, loc_s, attn_s)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # output stays token-sharded: each device holds Lq/8 queries
    shard_shapes = {s.data.shape for s in got.addressable_shards}
    assert shard_shapes == {(2, 336 // 8, 4 * 8)}, shard_shapes


def test_msda_token_sharded_grads_match():
    shapes, value, loc, attn = _inputs()
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("model",))

    def loss_ref(v, l, a):
        return ms_deform_attn(v, shapes, l, a).astype(jnp.float32).sum()

    def loss_sp(v, l, a):
        return msda_token_sharded(v, shapes, l, a,
                                  mesh).astype(jnp.float32).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(value, loc, attn)
    g_sp = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(value, loc, attn)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
