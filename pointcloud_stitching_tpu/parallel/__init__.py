from .mesh import make_mesh, make_sharded_stitch, replicate
from .ring_nn import ring_nearest_neighbors
from .shard_stitch import make_shardmap_stitch

__all__ = ["make_mesh", "make_sharded_stitch", "make_shardmap_stitch",
           "replicate", "ring_nearest_neighbors"]
