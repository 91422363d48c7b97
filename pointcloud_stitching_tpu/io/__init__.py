from .calio import discover_cals, load_cal, load_cals, save_cal
from .plyio import load_ply, save_cloud, save_ply
from .render import render_cloud, render_orthographic, save_image

__all__ = ["discover_cals", "load_cal", "load_cals", "save_cal",
           "load_ply", "save_cloud", "save_ply",
           "render_cloud", "render_orthographic", "save_image"]
