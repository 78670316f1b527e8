"""Device mesh + sharding helpers (TPU-native data parallelism).

Replaces the reference's NCCL/DDP stack (SURVEY §2.7): one 1-D `data` mesh
over all chips; batch sharded over it, params replicated. Gradient averaging,
SyncBN statistics and loss normalizers all become XLA collectives inserted by
the compiler — no explicit NCCL calls (reference
`detection/configs/_base_/default_runtime.py:13`, `dist_utils.py:14-121`).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Shard leading (batch) axis of every leaf over the mesh."""
    def _shard(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(_shard, batch)


def replicate(mesh: Mesh, tree):
    """Replicate every leaf across the mesh (params / optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
