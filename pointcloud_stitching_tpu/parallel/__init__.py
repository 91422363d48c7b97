from .mesh import make_mesh, make_sharded_stitch, replicate
from .ring_nn import ring_nearest_neighbors
from .shard_stitch import make_shardmap_stitch
from .multihost import init_multihost
from .tsdf_shard import (make_sharded_integrate, make_sharded_raycast,
                         shard_volume)

__all__ = ["init_multihost", "make_mesh", "make_sharded_integrate",
           "make_sharded_raycast", "make_sharded_stitch",
           "make_shardmap_stitch", "replicate", "ring_nearest_neighbors",
           "shard_volume"]
