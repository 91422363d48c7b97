from .mesh import make_mesh, make_sharded_stitch, replicate
from .ring_nn import ring_nearest_neighbors
from .shard_stitch import make_shardmap_stitch
from .multihost import init_multihost

__all__ = ["init_multihost", "make_mesh", "make_sharded_stitch",
           "make_shardmap_stitch", "replicate", "ring_nearest_neighbors"]
