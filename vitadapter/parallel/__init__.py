from vitadapter.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
)
