from e3diff_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_sharding_rules,
    shard_params,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_sharding_rules",
    "shard_params",
    "shard_batch",
]
