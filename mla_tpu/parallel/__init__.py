from mla_tpu.parallel.mesh import make_mesh
from mla_tpu.parallel.sharding import (
    batch_sharding,
    param_shardings,
    replicate,
    shard_batch,
    shard_params,
)

__all__ = [
    "make_mesh",
    "param_shardings",
    "batch_sharding",
    "replicate",
    "shard_batch",
    "shard_params",
]
