from open3dsot_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
    shard_map_batch,
    shard_map_nocheck,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "shard_map_batch", "shard_map_nocheck"]
