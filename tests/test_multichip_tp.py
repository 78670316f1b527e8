"""Tensor-parallel (2-D mesh) training-step tests on the virtual CPU mesh.

The reference scales only by DDP; the TPU-native design adds Megatron-style
tensor parallelism as pure PartitionSpecs (`vitadapter/parallel/tp.py`).
These tests check on an 8-device (data=2, model=4) mesh that
  * the rules actually shard the FFN/attention kernels over `model`,
  * one full Mask2Former train step runs and matches the replicated
    (data-parallel only) step numerically,
  * optimizer moments inherit the param sharding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vitadapter.parallel.mesh import make_mesh, replicate, shard_batch
from vitadapter.parallel.tp import (make_tp_mesh, partition_specs,
                                    shard_batch_2d, shard_state)
from vitadapter.train.optim import make_optimizer
from vitadapter.train.trainer import TrainState, make_m2f_train_step
from vitadapter.zoo import mask2former_vit_adapter

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def _tiny_m2f():
    return mask2former_vit_adapter(
        "tiny", num_classes=7, num_queries=8,
        embed_dim=48, num_heads=4, deform_num_heads=4, conv_inplane=16)


def _setup():
    model = _tiny_m2f()
    B, H, W = 8, 64, 64
    img = jnp.zeros((B, H, W, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), img)
    tx, _ = make_optimizer(variables["params"], total_steps=50,
                           warmup_steps=5, grad_clip=1.0)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    batch = {
        "image": np.random.RandomState(0).randn(B, H, W, 3).astype(
            np.float32),
        "label": np.random.RandomState(1).randint(
            0, 7, (B, H, W)).astype(np.int32),
    }
    step = make_m2f_train_step(model, num_classes=7, max_instances=6,
                               num_points=64)
    return state, batch, step


def test_partition_specs_shard_transformer_kernels():
    model = _tiny_m2f()
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), img)
    specs = partition_specs(variables["params"])
    flat = {"/".join(str(k.key) for k in path): spec
            for path, spec in jax.tree_util.tree_flatten_with_path(specs)[0]}
    # backbone ViT FFN + attention
    qkv = [k for k in flat if k.endswith("attn/qkv/kernel")]
    assert qkv and all(flat[k][-1] == "model" for k in qkv)
    mlp1 = [k for k in flat if k.endswith("mlp/fc1/kernel")]
    assert mlp1 and all(flat[k][-1] == "model" for k in mlp1)
    mlp2 = [k for k in flat if k.endswith("mlp/fc2/kernel")]
    assert mlp2 and all(flat[k][-2] == "model" and flat[k][-1] is None
                        for k in mlp2)
    # pixel-decoder scan-stacked FFN: (L, Cin, Cout) kernels
    enc1 = [k for k in flat if "encoder_layers" in k
            and k.endswith("ffn_fc1/kernel")]
    assert enc1 and all(flat[k][-1] == "model" for k in enc1)
    # decoder MHA
    qp = [k for k in flat if k.endswith("cross_attn/q_proj/kernel")]
    assert qp and all(flat[k][-1] == "model" for k in qp)
    op = [k for k in flat if k.endswith("cross_attn/out_proj/kernel")]
    assert op and all(flat[k][-2] == "model" for k in op)
    # ConvFFN (adapter) fc1 must stay replicated (depthwise conv on hidden)
    convffn = [k for k in flat if "ffn/fc1/kernel" in k]
    assert all(flat[k] == P() for k in convffn)


def test_tp_step_matches_dp_step():
    state, batch, step = _setup()

    # --- data-parallel reference on the 1-D mesh ---
    mesh1 = make_mesh(jax.devices()[:8])
    dp_state = replicate(mesh1, state)
    dp_batch = shard_batch(mesh1, batch)
    rng = jax.device_put(jax.random.PRNGKey(0), NamedSharding(mesh1, P()))
    dp_state, dp_logs = jax.jit(step)(dp_state, dp_batch, rng)
    dp_loss = float(dp_logs["loss"])

    # --- tensor+data parallel on the (2, 4) mesh ---
    mesh2 = make_tp_mesh(jax.devices()[:8], tp=4)
    tp_state = shard_state(mesh2, state)
    # params must actually be sharded over model
    qkv = tp_state.params["backbone"]["vit"]["blocks_0"]["attn"]["qkv"]["kernel"]
    shard_shapes = {s.data.shape for s in qkv.addressable_shards}
    assert shard_shapes == {(qkv.shape[0], qkv.shape[1] // 4)}, shard_shapes
    tp_batch = shard_batch_2d(mesh2, batch)
    rng2 = jax.device_put(jax.random.PRNGKey(0), NamedSharding(mesh2, P()))
    tp_state, tp_logs = jax.jit(step)(tp_state, tp_batch, rng2)
    tp_loss = float(tp_logs["loss"])

    assert np.isfinite(tp_loss)
    np.testing.assert_allclose(tp_loss, dp_loss, rtol=2e-4)
    np.testing.assert_allclose(float(tp_logs["grad_norm"]),
                               float(dp_logs["grad_norm"]), rtol=2e-3)

    # optimizer moments follow the param sharding (not replicated)
    def find_mu(node):
        if hasattr(node, "mu"):
            return node.mu
        if isinstance(node, (tuple, list)):
            for sub in node:
                r = find_mu(sub)
                if r is not None:
                    return r
        return None

    mu = find_mu(tp_state.opt_state)
    assert mu is not None
    mu_qkv = mu["backbone"]["vit"]["blocks_0"]["attn"]["qkv"]["kernel"]
    mu_shapes = {s.data.shape for s in mu_qkv.addressable_shards}
    assert mu_shapes == {(qkv.shape[0], qkv.shape[1] // 4)}, mu_shapes
