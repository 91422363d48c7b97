from .mesh import make_mesh, make_sharded_stitch, replicate
from .ring_nn import ring_nearest_neighbors

__all__ = ["make_mesh", "make_sharded_stitch", "replicate",
           "ring_nearest_neighbors"]
