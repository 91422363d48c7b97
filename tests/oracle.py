"""Numpy oracle implementing the PCL/librealsense-equivalent math.

This is the correctness contract for every on-device op (BASELINE.json:
"match the PCL reference bit-for-bit up to float tolerance"). Written from
the published math, independently of the JAX implementations:
  * deprojection: librealsense rs2_deproject_pixel_to_point
  * voxel grid: pcl::VoxelGrid centroid semantics
  * NN: exhaustive O(N*M) search (what KdTreeFLANN approximates exactly)
  * Kabsch: pcl::registration::TransformationEstimationSVD
  * ICP: PCL's correspondence→reject→solve→iterate loop
"""
from __future__ import annotations

import numpy as np


def deproject_np(depth_u16, fx, fy, ppx, ppy, depth_scale=0.001, coeffs=None,
                 model="none", z_min=0.0, z_max=np.inf):
    """Returns (xyz [H*W,3] float32 row-major, mask [H*W] bool)."""
    h, w = depth_u16.shape
    z = depth_u16.astype(np.float32) * np.float32(depth_scale)
    u, v = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32))
    x = (u - np.float32(ppx)) / np.float32(fx)
    y = (v - np.float32(ppy)) / np.float32(fy)
    if model == "brown_conrady":
        k1, k2, p1, p2, k3 = coeffs
        xo, yo = x.copy(), y.copy()
        xq, yq = x.copy(), y.copy()
        for _ in range(10):
            r2 = xq * xq + yq * yq
            icdist = 1.0 / (1.0 + ((k3 * r2 + k2) * r2 + k1) * r2)
            dx = 2.0 * p1 * xq * yq + p2 * (r2 + 2 * xq * xq)
            dy = 2.0 * p2 * xq * yq + p1 * (r2 + 2 * yq * yq)
            xq = (xo - dx) * icdist
            yq = (yo - dy) * icdist
        x, y = xq, yq
    elif model == "inverse_brown_conrady":
        k1, k2, p1, p2, k3 = coeffs
        r2 = x * x + y * y
        f = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
        ux = x * f + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        uy = y * f + 2 * p2 * x * y + p1 * (r2 + 2 * y * y)
        x, y = ux, uy
    xyz = np.stack([x * z, y * z, z], axis=-1).reshape(-1, 3).astype(np.float32)
    mask = (z > max(z_min, 0.0)) & (z <= z_max)
    mask = mask.reshape(-1)
    xyz[~mask] = 0.0
    return xyz, mask


def transform_np(T, xyz):
    return (xyz @ np.asarray(T, np.float32)[:3, :3].T
            + np.asarray(T, np.float32)[:3, 3])


def project_np(xyz, fx, fy, ppx, ppy, coeffs=None, model="none"):
    """rs2_project_point_to_pixel: returns (uv [N,2] float32, in_front)."""
    z = xyz[:, 2]
    in_front = z > 1e-9
    zs = np.where(in_front, z, 1.0)
    x, y = xyz[:, 0] / zs, xyz[:, 1] / zs
    if model == "brown_conrady":      # forward polynomial on projection
        k1, k2, p1, p2, k3 = coeffs
        r2 = x * x + y * y
        f = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
        ux = x * f + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        uy = y * f + 2 * p2 * x * y + p1 * (r2 + 2 * y * y)
        x, y = ux, uy
    u = x * np.float32(fx) + np.float32(ppx)
    v = y * np.float32(fy) + np.float32(ppy)
    return np.stack([u, v], axis=-1).astype(np.float32), in_front


def map_color_np(xyz, mask, color_img, c_fx, c_fy, c_ppx, c_ppy, d2c,
                 coeffs=None, model="none"):
    """rs2 map_to texture lookup: nearest color pixel per 3-D point."""
    hc, wc = color_img.shape[:2]
    xyz_c = transform_np(d2c, xyz)
    uv, in_front = project_np(xyz_c, c_fx, c_fy, c_ppx, c_ppy, coeffs, model)
    ui = np.round(uv[:, 0]).astype(np.int64)
    vi = np.round(uv[:, 1]).astype(np.int64)
    in_fov = in_front & (ui >= 0) & (ui < wc) & (vi >= 0) & (vi < hc)
    ui, vi = np.clip(ui, 0, wc - 1), np.clip(vi, 0, hc - 1)
    rgb = color_img[vi, ui].astype(np.float32)
    rgb[~(mask & in_fov)] = 0.0
    return rgb


def voxel_downsample_np(xyz, leaf, rgb=None):
    """PCL VoxelGrid semantics: centroid per voxel, ordered by (ix, iy, iz).

    Returns (xyz [U,3], rgb [U,3] or None).
    """
    xyz = np.asarray(xyz, np.float32)
    if len(xyz) == 0:
        return xyz.reshape(0, 3), (None if rgb is None else rgb.reshape(0, 3))
    # multiply by the reciprocal (PCL stores inverse_leaf_size_ and
    # multiplies; x/leaf differs in the last ulp and flips boundary voxels)
    f = np.floor(xyz * np.float32(1.0 / np.float32(leaf))).astype(np.int64)
    ijk = f - f.min(axis=0)
    order_key = (ijk[:, 0], ijk[:, 1], ijk[:, 2])
    # group by (ix, iy, iz), ascending lexicographic
    keys = ijk[:, 0] * (2 ** 42) + ijk[:, 1] * (2 ** 21) + ijk[:, 2]
    assert ijk.max() < 2 ** 21
    uniq, inv = np.unique(keys, return_inverse=True)
    out = np.zeros((len(uniq), 3), np.float64)
    cnt = np.zeros(len(uniq), np.float64)
    np.add.at(out, inv, xyz.astype(np.float64))
    np.add.at(cnt, inv, 1.0)
    out_xyz = (out / cnt[:, None]).astype(np.float32)
    out_rgb = None
    if rgb is not None:
        orgb = np.zeros((len(uniq), 3), np.float64)
        np.add.at(orgb, inv, np.asarray(rgb, np.float64))
        out_rgb = (orgb / cnt[:, None]).astype(np.float32)
    return out_xyz, out_rgb


def nn_np(query, ref):
    """Exhaustive NN. Returns (idx [N], d2 [N])."""
    d2 = ((query[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    idx = d2.argmin(axis=1)
    return idx, d2[np.arange(len(query)), idx]


def kabsch_np(src, dst, weights=None):
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    w = np.ones(len(src)) if weights is None else np.asarray(weights, np.float64)
    wsum = w.sum()
    cs = (w[:, None] * src).sum(0) / wsum
    cd = (w[:, None] * dst).sum(0) / wsum
    H = (w[:, None] * (src - cs)).T @ (dst - cd)
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    S = np.diag([1.0, 1.0, d])
    R = Vt.T @ S @ U.T
    t = cd - R @ cs
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T.astype(np.float32)


def icp_np(src, dst, iterations=5, max_corr_dist=0.1, init_T=None):
    T = np.eye(4, dtype=np.float32) if init_T is None else np.asarray(init_T)
    for _ in range(iterations):
        p = transform_np(T, src)
        idx, d2 = nn_np(p, dst)
        w = (d2 <= max_corr_dist ** 2).astype(np.float64)
        dT = kabsch_np(p, dst[idx], w)
        T = dT @ T
    return T


# ---------------------------------------------------------------------------
# Synthetic scene generation (the recorded-stream stand-in; SURVEY.md §4)
# ---------------------------------------------------------------------------

def synth_depth_frame(h=480, w=848, seed=0, max_mm=4000):
    """A synthetic-but-structured depth frame: multi-octave surfaces + spheres
    + holes. Mimics a room scan (~7% invalid pixels). Frequencies scale with
    frame size so small test frames keep enough structure for ICP to lock
    (a single smooth wave lets point-to-point ICP slide along the surface).
    """
    rng = np.random.default_rng(seed)
    u, v = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32))
    depth = (1500 + 500 * np.sin(u / (w * 0.23)) + 400 * np.cos(v / (h * 0.19))
             + 150 * np.sin(u / (w * 0.041) + 1.0)
             + 120 * np.cos(v / (h * 0.037)))
    for _ in range(8):
        cu, cv = rng.uniform(0, w), rng.uniform(0, h)
        r = rng.uniform(0.04, 0.14) * min(h, w)
        d = rng.uniform(600, max_mm * 0.8)
        m = (u - cu) ** 2 + (v - cv) ** 2 < r ** 2
        depth[m] = d
    holes = rng.random((h, w)) < 0.07
    depth[holes] = 0
    return np.clip(depth, 0, max_mm).astype(np.uint16)


def random_se3(seed=0, max_angle=0.5, max_trans=0.5):
    rng = np.random.default_rng(seed)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = rng.uniform(-max_angle, max_angle)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = rng.uniform(-max_trans, max_trans, 3)
    return T.astype(np.float32)
