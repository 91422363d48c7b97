from .calio import (discover_cals, discover_intrinsics, load_cal,
                    load_cals, load_intrinsics,
                    load_intrinsics_stack, save_cal,
                    save_intrinsics)
from .plyio import load_ply, save_cloud, save_mesh, save_ply
from .pcdio import load_pcd, save_pcd
from .picker import (pick_index, project_pixels, projection_bounds,
                     render_indexed, save_picks)
from .render import render_cloud, render_orthographic, save_image

__all__ = ["discover_cals", "discover_intrinsics", "load_cal",
           "load_cals", "load_intrinsics", "load_intrinsics_stack",
           "save_cal", "save_intrinsics",
           "load_ply", "save_cloud", "save_mesh", "save_ply",
           "load_pcd", "save_pcd",
           "pick_index", "project_pixels", "projection_bounds",
           "render_indexed", "save_picks",
           "render_cloud", "render_orthographic", "save_image"]
