from .calio import discover_cals, load_cal, load_cals, save_cal
from .plyio import load_ply, save_cloud, save_ply
from .pcdio import load_pcd, save_pcd
from .render import render_cloud, render_orthographic, save_image

__all__ = ["discover_cals", "load_cal", "load_cals", "save_cal",
           "load_ply", "save_cloud", "save_ply",
           "load_pcd", "save_pcd",
           "render_cloud", "render_orthographic", "save_image"]
