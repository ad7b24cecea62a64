from .mesh import (
    batch_sharding,
    build_train_mesh,
    create_mesh,
    param_sharding_rule,
    place_train_state,
    replicate,
    shard_batch,
    shard_params_tp,
)

__all__ = [
    "create_mesh",
    "build_train_mesh",
    "place_train_state",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "param_sharding_rule",
    "shard_params_tp",
]
