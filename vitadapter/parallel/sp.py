"""Sequence (token) parallelism for the deformable-attention compute path.

Deformable attention is LOCAL per query: given the (small) full value
tensor, every query's sampling is independent. That makes the dominant
high-resolution workload — the pixel-decoder encoder over sum(H_l*W_l)
tokens — sequence-shardable: split the query tokens across the mesh, keep
the value replicated (it is the coarse pyramid, a few MB), and every
sampling/projection/FFN op runs on a 1/N token slice with zero
communication until (if ever) a full gather is needed.

`msda_token_sharded` wraps the MSDA sampling core in a `shard_map` over the
query axis, so the hand-written Pallas kernel (which GSPMD cannot partition
through) runs per-shard on its token slice. Surrounding Dense/LN ops are
ordinary XLA and follow the token sharding via GSPMD propagation.

No reference counterpart (DDP only); this is the TPU-native long-context
lever for 896px+ inputs (SURVEY §5.7).
"""

from functools import partial
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from vitadapter.ops.msda import SpatialShapes, ms_deform_attn


def msda_token_sharded(value: jax.Array, spatial_shapes: SpatialShapes,
                       sampling_locations: jax.Array,
                       attention_weights: jax.Array, mesh: Mesh,
                       axis: str = "model",
                       impl: str = "auto") -> jax.Array:
    """MSDA sampling with queries sharded over `axis`, value replicated.

    Lq must be divisible by the mesh axis size. Per-level query segments
    are not forwarded (a token shard straddles pyramid levels)."""
    n = mesh.shape[axis]
    Lq = sampling_locations.shape[1]
    assert Lq % n == 0, (Lq, n)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(None, axis), P(None, axis)),
             out_specs=P(None, axis), check_rep=False)
    def run(v, loc, a):
        return ms_deform_attn(v, spatial_shapes, loc, a, impl=impl)

    return run(value, sampling_locations, attention_weights)
