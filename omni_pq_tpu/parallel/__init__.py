from .mesh import (make_mesh, batch_sharding, replicated_sharding,
                   shard_batch, replicate, per_host_batch_size,
                   init_distributed, make_global_batch, gather_scenes)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "replicate", "per_host_batch_size",
           "init_distributed", "make_global_batch", "gather_scenes"]
