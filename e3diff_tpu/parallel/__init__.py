from e3diff_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_sharding_rules,
    shard_params,
    shard_batch,
)
from e3diff_tpu.parallel.multihost import (
    distribute_batch,
    host_local_slice,
    initialize_multihost,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_sharding_rules",
    "shard_params",
    "shard_batch",
    "distribute_batch",
    "host_local_slice",
    "initialize_multihost",
]
