from geovpr.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = ["batch_sharding", "create_mesh", "replicated_sharding", "shard_batch"]
