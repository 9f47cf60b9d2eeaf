from geovpr.parallel.mesh import (
    batch_sharding,
    create_hybrid_mesh,
    create_mesh,
    initialize_distributed,
    replicated_sharding,
    shard_batch,
)

__all__ = ["batch_sharding", "create_hybrid_mesh", "create_mesh",
           "initialize_distributed", "replicated_sharding", "shard_batch"]
