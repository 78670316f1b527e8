"""Pipeline parallelism (GPipe over a `stage` mesh axis) on the CPU mesh.

Checks that `parallel/pp.py` streams microbatches through stage-sharded
layer stacks with results identical to the sequential stack, forward and
backward, for (a) plain MLP layers and (b) real ViT encoder blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vitadapter.parallel.pp import (make_pp_mesh, pipeline_apply,
                                    shard_stacked, stack_layer_params)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def _mlp_stack(depth, dim, hidden, seed):
    rng = np.random.RandomState(seed)
    return [
        {"w1": jnp.asarray(rng.randn(dim, hidden) * 0.1, jnp.float32),
         "b1": jnp.zeros((hidden,), jnp.float32),
         "w2": jnp.asarray(rng.randn(hidden, dim) * 0.1, jnp.float32),
         "b2": jnp.zeros((dim,), jnp.float32)}
        for _ in range(depth)
    ]


def _mlp_layer(p, x):
    y = jnp.tanh(x @ p["w1"] + p["b1"])
    return x + y @ p["w2"] + p["b2"]


def _stage_fn(params_local, x):
    # apply this stage's slice of layers sequentially
    def body(x, p):
        return _mlp_layer(p, x), None
    x, _ = jax.lax.scan(lambda c, p: (_mlp_layer(p, c), None),
                        x, params_local)
    return x


def test_pp_matches_sequential_forward_and_grad():
    depth, dim, hidden = 8, 16, 32
    n_micro, mb = 4, 2
    layers = _mlp_stack(depth, dim, hidden, 0)
    stacked = stack_layer_params(layers)
    xs = jnp.asarray(np.random.RandomState(1).randn(n_micro, mb, dim),
                     jnp.float32)

    # sequential reference
    def seq(stacked, xs):
        def one(x):
            def body(c, p):
                return _mlp_layer(p, c), None
            y, _ = jax.lax.scan(body, x, stacked)
            return y
        return jax.vmap(one)(xs)

    want = seq(stacked, xs)

    mesh = make_pp_mesh(jax.devices()[:8])
    sharded = shard_stacked(mesh, stacked)
    xs_dev = jax.device_put(xs, NamedSharding(mesh, P()))
    got = jax.jit(lambda p, x: pipeline_apply(_stage_fn, p, x, mesh))(
        sharded, xs_dev)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # gradient parity through the pipeline schedule
    def loss_pp(p, x):
        return pipeline_apply(_stage_fn, p, x, mesh).sum()

    def loss_seq(p, x):
        return seq(p, x).sum()

    g_pp = jax.jit(jax.grad(loss_pp))(sharded, xs_dev)
    g_seq = jax.grad(loss_seq)(stacked, xs)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pp_vit_blocks():
    """Real ViT encoder blocks (attention + MLP) through the pipeline."""
    from vitadapter.models.vit import Block

    depth, dim, heads = 8, 48, 4
    H = W = 4
    blk = Block(num_heads=heads, mlp_ratio=2.0)
    x0 = jnp.asarray(np.random.RandomState(2).randn(2, H * W, dim),
                     jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), depth)
    layers = [blk.init(k, x0, H, W)["params"] for k in keys]
    stacked = stack_layer_params(layers)

    def stage_fn(params_local, x):
        def body(c, p):
            return blk.apply({"params": p}, c, H, W), None
        y, _ = jax.lax.scan(body, x, params_local)
        return y

    n_micro = 4
    xs = jnp.asarray(np.random.RandomState(3).randn(n_micro, 2, H * W, dim),
                     jnp.float32)

    def seq(xs):
        y = xs.reshape(-1, H * W, dim)
        for p in layers:
            y = blk.apply({"params": p}, y, H, W)
        return y.reshape(xs.shape)

    want = seq(xs)
    mesh = make_pp_mesh(jax.devices()[:8])
    sharded = shard_stacked(mesh, stacked)
    got = jax.jit(lambda p, x: pipeline_apply(stage_fn, p, x, mesh))(
        sharded, jax.device_put(xs, NamedSharding(mesh, P())))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
