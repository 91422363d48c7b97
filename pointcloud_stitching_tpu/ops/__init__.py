from .deproject import (deproject, deproject_with_color,
                        deproject_with_color_mapped, map_color,
                        project)
from .se3 import (se3_apply, se3_compose, se3_from_rt, se3_identity,
                  se3_inverse, transform_cloud)
from .voxel import decimate_depth, voxel_downsample, voxel_indices
from .fuse import compact, fuse, fuse_batched
from .nn import nearest_neighbors
from .kabsch import kabsch
from .icp import (ICPResult, icp, icp_batched, icp_converge,
                  icp_point_to_plane_batched)
from .gicp import gicp, gicp_covariances
from .ndt import NDTMap, ndt, ndt_align, ndt_build
from .normals import decode_normals, grid_normals
from .fpfh import fpfh, match_fpfh
from .keypoints import iss_keypoints
from .vfh import vfh
from .sac import extract_plane, project_plane, segment_plane
from .cluster import (cluster_stats, euclidean_clusters,
                      euclidean_clusters_exact, oriented_bboxes,
                      region_growing)
from .mls import estimate_curvature, estimate_normals, mls_smooth
from .mesh import organized_mesh
from .surface import (field_from_map, marching_tetrahedra,
                      reconstruct_surface, soup_triangles, weld_mesh)
from .change import detect_changes, detect_changes_map
from .hull import (ConcaveHullResult, ConvexHullResult, concave_hull,
                   convex_hull, crop_hull)
from .search import knn_search, radius_search
from .filters import (bilateral_depth, count_neighbors, crop_box,
                      frustum_cull, knn_mean_distance,
                      passthrough, radius_outlier_removal,
                      statistical_outlier_removal)

__all__ = [
    "deproject", "deproject_with_color",
    "deproject_with_color_mapped", "map_color", "project",
    "se3_apply", "se3_compose", "se3_from_rt", "se3_identity", "se3_inverse",
    "transform_cloud",
    "decimate_depth", "voxel_downsample", "voxel_indices",
    "compact", "fuse", "fuse_batched",
    "nearest_neighbors", "kabsch",
    "ICPResult", "icp", "icp_batched", "icp_converge",
    "icp_point_to_plane_batched", "gicp", "gicp_covariances",
    "NDTMap", "ndt", "ndt_align", "ndt_build",
    "grid_normals", "decode_normals",
    "segment_plane", "extract_plane", "project_plane",
    "euclidean_clusters",
    "cluster_stats", "euclidean_clusters_exact", "oriented_bboxes",
    "region_growing",
    "estimate_curvature", "mls_smooth", "organized_mesh",
    "field_from_map", "marching_tetrahedra", "reconstruct_surface",
    "soup_triangles", "weld_mesh", "detect_changes", "detect_changes_map",
    "ConcaveHullResult", "ConvexHullResult", "concave_hull",
    "convex_hull", "crop_hull",
    "knn_search", "radius_search",
    "estimate_normals", "fpfh", "match_fpfh", "iss_keypoints", "vfh",
    "bilateral_depth", "count_neighbors", "crop_box", "frustum_cull",
    "knn_mean_distance", "passthrough",
    "radius_outlier_removal", "statistical_outlier_removal",
]
