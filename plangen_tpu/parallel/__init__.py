from plangen_tpu.parallel.mesh import (
    create_mesh,
    param_shardings,
    batch_sharding,
    shard_params,
)

__all__ = ["create_mesh", "param_shardings", "batch_sharding", "shard_params"]
