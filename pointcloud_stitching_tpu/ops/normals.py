"""Surface normals from organized depth images.

The reference has no normal estimation (point-to-point ICP only). For
organized clouds — points laid out on the sensor grid, which is exactly
what deprojection produces — normals are a pure elementwise map: the cross
product of the horizontal and vertical neighbour differences. No KD-tree,
no covariance eigensolve; one fused VPU pass, batched over cameras. These
feed the point-to-plane ICP variant (ops/icp.py), which converges in
roughly half the iterations of point-to-point and does not slide on smooth
surfaces.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_normals(xyz_grid: jax.Array, mask_grid: jax.Array,
                 flip_towards_origin: bool = True):
    """Per-pixel normals of an organized cloud.

    Args:
      xyz_grid: [..., H, W, 3] sensor-frame points (invalid slots zeroed).
      mask_grid: [..., H, W] validity.
    Returns:
      (normals [..., H, W, 3] unit vectors, valid [..., H, W]) — a normal is
      valid when the pixel and both forward neighbours are valid. Normals
      are oriented toward the sensor origin (PCL's viewpoint convention)
      when flip_towards_origin is set.
    """
    right = jnp.roll(xyz_grid, -1, axis=-2)   # u+1
    down = jnp.roll(xyz_grid, -1, axis=-3)    # v+1
    m_right = jnp.roll(mask_grid, -1, axis=-1)
    m_down = jnp.roll(mask_grid, -1, axis=-2)

    du = right - xyz_grid
    dv = down - xyz_grid
    n = jnp.cross(dv, du)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    valid = mask_grid & m_right & m_down & (norm[..., 0] > 1e-12)
    # roll wraps at the grid edge: last row/col neighbours are bogus
    h, w = mask_grid.shape[-2], mask_grid.shape[-1]
    edge = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) < h - 1) & \
           (jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) < w - 1)
    valid = valid & edge
    n = n / jnp.maximum(norm, 1e-12)
    if flip_towards_origin:
        # orient toward the sensor at the origin: n·p should be negative
        flip = jnp.sum(n * xyz_grid, axis=-1, keepdims=True) > 0
        n = jnp.where(flip, -n, n)
    n = jnp.where(valid[..., None], n, 0.0)
    return n, valid


def decode_normals(cloud, min_norm: float = 0.3):
    """Unit world normals from a ``with_normals`` pipeline output.

    The stitcher encodes normals as 3x8-bit integers in the cloud's rgb
    channel (q = (n + 1) * 127.5) so they ride the packed voxel sort; the
    per-voxel value is the member average. Decoding inverts the affine map
    and renormalizes. A short average (|n| < min_norm) means the voxel's
    members disagreed (a depth edge, mixed surfaces) or mostly carried no
    valid normal — those decode to zero with valid=False, the same
    convention PCL consumers use for NaN normals.

    Returns (normals [..., N, 3], valid [..., N]).
    """
    if cloud.rgb is None:
        raise ValueError("cloud has no encoded normals (rgb is None); "
                         "run the pipeline with cfg.with_normals=True")
    n = cloud.rgb * (1.0 / 127.5) - 1.0
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    ok = cloud.mask & (norm[..., 0] >= min_norm)
    n = jnp.where(ok[..., None], n / jnp.maximum(norm, 1e-12), 0.0)
    return n, ok
