"""Cross-replica reduction helpers.

Parity targets (reference `segmentation/mmseg_custom/core/utils/dist_utils.py`):
  * `reduce_mean` (:66-73) — loss-normalizer averaging across replicas.
  * `allreduce_grads` (:14-56) — gradient all-reduce (under jit over a global
    batch the compiler inserts this; the explicit version exists for
    shard_map/pmap code paths).
  * `all_reduce_dict` (:87-121) — dict-of-scalars reduction.
Eval-result gathering (reference `multi_gpu_test` tmpdir/all_gather) maps to
`process_allgather`.
"""

from typing import Dict

import jax
import jax.numpy as jnp


def reduce_mean(x: jax.Array, axis_name: str = "data") -> jax.Array:
    """Mean across the data axis (inside shard_map/pmap)."""
    return jax.lax.pmean(x, axis_name)


def allreduce_grads(grads, axis_name: str = "data"):
    return jax.tree_util.tree_map(lambda g: jax.lax.pmean(g, axis_name),
                                  grads)


def all_reduce_dict(d: Dict[str, jax.Array], op: str = "mean",
                    axis_name: str = "data") -> Dict[str, jax.Array]:
    fn = jax.lax.pmean if op == "mean" else jax.lax.psum
    return {k: fn(v, axis_name) for k, v in d.items()}


def process_allgather(x):
    """Gather host-local results across processes (eval collection)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x)
