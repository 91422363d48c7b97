from .mesh import make_mesh, make_sharded_stitch, replicate

__all__ = ["make_mesh", "make_sharded_stitch", "replicate"]
