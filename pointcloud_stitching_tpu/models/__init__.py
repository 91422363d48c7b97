from .stitcher import (StitchingPipeline, StitchMetrics, StitchOutput,
                       autofit_out_leaf, stitch_points_step, stitch_step)
from .registration import (RegistrationResult, register_from_correspondences,
                           register_global, register_pair, write_cal)
from .voxel_map import (TemporalAccumulator, VoxelMap, load_map, localize,
                        save_map, voxel_map_update)
from .pose_graph import (PoseGraphResult, chain_initial_poses,
                         optimize_pose_graph, register_rig)
from .tsdf import (RaycastResult, RigTrackResult, TrackResult, TSDFVolume,
                   extract_cloud, extract_mesh, integrate, load_volume,
                   raycast, rig_track, save_volume, track)

__all__ = [
    "StitchingPipeline", "StitchMetrics", "StitchOutput", "stitch_step",
    "stitch_points_step", "autofit_out_leaf",
    "RegistrationResult", "register_from_correspondences", "register_pair",
    "register_global",
    "write_cal",
    "TemporalAccumulator", "VoxelMap", "load_map", "localize",
    "save_map", "voxel_map_update",
    "PoseGraphResult", "chain_initial_poses", "optimize_pose_graph",
    "register_rig",
    "TSDFVolume", "RaycastResult", "TrackResult", "RigTrackResult",
    "integrate", "raycast", "track", "rig_track",
    "extract_cloud", "extract_mesh", "save_volume", "load_volume",
]
