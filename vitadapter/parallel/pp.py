"""Pipeline parallelism (GPipe schedule) over a `stage` mesh axis.

The reference scales only by DDP; alongside the tensor-parallel rules
(`parallel/tp.py`) this adds the third classic axis: a stack of identical
layers (scan-stacked params, leading stacked-layer dim) is split across
devices, microbatches stream through the stages, and activations hop
stage-to-stage over ICI via `lax.ppermute` inside a `shard_map`.

Schedule: plain GPipe fill-and-drain. With S stages and M microbatches the
loop runs T = M + S - 1 steps; at step t, stage s computes microbatch
(t - s) when 0 <= t - s < M. Bubble fraction = (S-1)/T, amortized by M.
Everything is differentiable (fori_loop + ppermute), so the same schedule
serves the backward pass under `jax.grad`.

Layout contract:
  * `stacked_params`: every leaf has leading dim == total layer count,
    sharded over `axis` (layers per stage = depth / n_stages).
  * `xs`: (n_micro, micro_batch, ...) microbatched input, replicated.
  * returns (n_micro, micro_batch, ...) outputs, replicated.
"""

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def make_pp_mesh(devices=None, axis: str = "stage") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def pipeline_apply(layer_fn: Callable, stacked_params, xs, mesh: Mesh,
                   axis: str = "stage"):
    """Run `xs` microbatches through the pipelined layer stack.

    layer_fn(params_one_stage, x) -> x applies this stage's slice of layers
    (params_one_stage keeps the local leading layer dim — loop over it or
    `lax.scan` inside).
    """
    n_stage = mesh.shape[axis]
    n_micro = xs.shape[0]

    def body(params_local, xs):
        stage = jax.lax.axis_index(axis)
        T = n_micro + n_stage - 1
        # mark the carries as stage-varying up front (the loop body makes
        # them varying; shard_map requires matching carry types)
        cur = jax.lax.pvary(jnp.zeros_like(xs[0]), axis)
        outs = jax.lax.pvary(jnp.zeros_like(xs), axis)

        def step(t, carry):
            cur, outs = carry
            # stage 0 ingests microbatch t while filling
            mb = jnp.clip(t, 0, n_micro - 1)
            inp = jnp.where(stage == 0, xs[mb], cur)
            out = layer_fn(params_local, inp)
            # last stage retires microbatch t - (S-1) while draining
            w = jnp.clip(t - (n_stage - 1), 0, n_micro - 1)
            live = jnp.logical_and(t >= n_stage - 1, stage == n_stage - 1)
            outs = jax.lax.dynamic_update_slice(
                outs,
                jnp.where(live, out,
                          jax.lax.dynamic_slice_in_dim(outs, w, 1, 0)[0]
                          )[None],
                (w,) + (0,) * out.ndim)
            # activations hop to the next stage (ring; the wrap-around
            # last->0 feed is ignored by stage 0's ingest select)
            nxt = jax.lax.ppermute(
                out, axis,
                [(i, (i + 1) % n_stage) for i in range(n_stage)])
            return nxt, outs

        cur, outs = jax.lax.fori_loop(0, T, step, (cur, outs))
        # replicate the last stage's outputs to every device
        outs = jax.lax.psum(
            jnp.where(stage == n_stage - 1, outs, 0), axis)
        return outs

    fn = shard_map(body, mesh=mesh, in_specs=(P(axis), P()),
                   out_specs=P())
    return fn(stacked_params, xs)


def stack_layer_params(per_layer_params):
    """[{...}, {...}, ...] -> one tree with stacked (L, ...) leaves."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *per_layer_params)


def shard_stacked(mesh: Mesh, stacked_params, axis: str = "stage"):
    """Place stacked (L, ...) params with layers split across stages."""
    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, stacked_params)
