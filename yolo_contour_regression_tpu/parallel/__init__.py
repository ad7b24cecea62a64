from .mesh import (
    batch_sharding,
    create_mesh,
    param_sharding_rule,
    replicate,
    shard_batch,
    shard_params_tp,
)

__all__ = [
    "create_mesh",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "param_sharding_rule",
    "shard_params_tp",
]
