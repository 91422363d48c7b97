from .calio import discover_cals, load_cal, load_cals, save_cal
from .plyio import load_ply, save_cloud, save_ply

__all__ = ["discover_cals", "load_cal", "load_cals", "save_cal",
           "load_ply", "save_cloud", "save_ply"]
