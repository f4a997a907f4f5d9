from faceoff_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    stage_global,
)
from faceoff_tpu.parallel.collectives import (
    get_world_size,
    get_rank,
    is_primary,
    all_reduce_mean,
    synchronize,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "stage_global",
    "get_world_size",
    "get_rank",
    "is_primary",
    "all_reduce_mean",
    "synchronize",
]
