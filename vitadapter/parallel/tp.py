"""Tensor-parallel sharding over a 2-D (data, model) mesh.

The reference's only parallelism is DDP (SURVEY §2.7); the TPU-native design
goes further: Megatron-style tensor parallelism for the transformer matmuls,
expressed purely as `PartitionSpec`s on the parameter tree — XLA/GSPMD
inserts the all-gathers/reduce-scatters over the `model` axis, and the
`data` axis keeps ordinary data parallelism. No module code changes: the
train step is the same pure function jit-ted with sharded inputs.

Sharding rules (classic fanout/fanin pairing, applied by parameter *path*):
  * fanout kernels (input side of a pair) shard their OUTPUT dim:
      attention `qkv` / `q_proj`/`k_proj`/`v_proj`, FFN `fc1`/`ffn_fc1`
    — each model-shard computes a head/hidden slice locally.
  * fanin kernels shard their INPUT dim:
      attention `proj`/`out_proj`, FFN `fc2`/`ffn_fc2`
    — the output stays partial-sum until GSPMD's psum over `model`.
  * everything else (norms, convs, embeddings, MSDA projections, heads)
    is replicated over `model` and behaves data-parallel.

Scan-stacked layers (leading stacked-layer axis, e.g. the pixel decoder's
6 encoder layers) are handled by sharding relative to the LAST dims, so the
same rule covers (Cin, Cout) and (L, Cin, Cout) kernels.

The deformable-attention Pallas kernel stays on replicated (per-data-shard)
activations: its value tensor is small (the coarse pyramid), and GSPMD
cannot partition into a hand-written kernel; the surrounding projections
are where the FLOPs are and those shard.
"""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# leaf-module names whose Dense kernel shards on the OUTPUT (last) dim
_FANOUT = {"qkv", "q_proj", "k_proj", "v_proj", "ffn_fc1"}
# leaf-module names whose Dense kernel shards on the INPUT (second-to-last)
_FANIN = {"out_proj", "ffn_fc2"}
# fc1/fc2 and proj are generic names; only shard them inside these parents
# (ConvFFN's fc1 feeds a depthwise conv on the hidden dim — keep replicated)
_FC_PARENTS = {"mlp"}
_PROJ_PARENTS = {"attn", "self_attn", "cross_attn"}


def make_tp_mesh(devices: Optional[Sequence] = None,
                 tp: int = 1) -> Mesh:
    """2-D (data, model) mesh: tp consecutive devices form a model group
    (consecutive = ICI-adjacent on real slices)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % tp == 0, (n, tp)
    return Mesh(np.asarray(devices).reshape(n // tp, tp), ("data", "model"))


def _spec_for(path: Tuple[str, ...], ndim: int) -> P:
    if ndim < 1 or path[-1] not in ("kernel", "bias"):
        return P()
    mod = path[-2] if len(path) >= 2 else ""
    parent = path[-3] if len(path) >= 3 else ""
    fanout = (mod in _FANOUT
              or (mod == "fc1" and parent in _FC_PARENTS))
    fanin = (mod in _FANIN
             or (mod == "fc2" and parent in _FC_PARENTS)
             or (mod == "proj" and parent in _PROJ_PARENTS))
    if path[-1] == "kernel" and ndim >= 2:
        if fanout:
            return P(*([None] * (ndim - 1) + ["model"]))
        if fanin:
            return P(*([None] * (ndim - 2) + ["model", None]))
    if path[-1] == "bias" and fanout:
        # bias of a fanout layer lives on the sharded output dim
        return P(*([None] * (ndim - 1) + ["model"]))
    return P()


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for p in path:
        names.append(p.key if hasattr(p, "key") else str(p))
    return tuple(names)


def partition_specs(params):
    """PyTree of PartitionSpec mirroring `params` (pass {'params': ...} or
    the bare param tree)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(_path_names(path), np.ndim(leaf)),
        params)


def shard_params(mesh: Mesh, params):
    """Place `params` on the mesh under the TP partitioning rules (data axis
    unused for params = replicated across data groups)."""
    specs = partition_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def shard_state(mesh: Mesh, state):
    """Shard a TrainState: params + optimizer moments follow the TP specs
    (optax state mirrors the param tree), everything else replicates."""
    pspecs = partition_specs(state.params)

    def put(tree, specs):
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, specs)

    def put_state_leaf(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    params = put(state.params, pspecs)

    def shard_opt(opt_state):
        # optax states are pytrees whose param-shaped members mirror the
        # param tree structure; detect them by structure match
        pstruct = jax.tree_util.tree_structure(state.params)

        def visit(node):
            if jax.tree_util.tree_structure(node) == pstruct:
                return put(node, pspecs)
            return jax.tree_util.tree_map(put_state_leaf, node)

        leaves, treedef = jax.tree_util.tree_flatten(
            opt_state, is_leaf=lambda n:
            jax.tree_util.tree_structure(n) == pstruct if n is not None
            else False)
        return jax.tree_util.tree_unflatten(
            treedef, [visit(l) for l in leaves])

    return state.replace(
        step=put_state_leaf(state.step),
        params=params,
        batch_stats=jax.tree_util.tree_map(put_state_leaf,
                                           state.batch_stats),
        opt_state=shard_opt(state.opt_state),
        ema_params=(None if state.ema_params is None
                    else put(state.ema_params, pspecs)))


def shard_batch_2d(mesh: Mesh, batch):
    """Shard the batch over `data`; replicated over `model`."""
    def _shard(x):
        spec = P("data", *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(_shard, batch)
