from .mesh import create_mesh, shard_batch, replicate, batch_sharding

__all__ = ["create_mesh", "shard_batch", "replicate", "batch_sharding"]
