"""Voxel-grid downsampling with fixed-capacity output.

TPU-native equivalent of ``pcl::VoxelGrid<pcl::PointXYZRGB>`` (reference:
src/pcs-multicamera-client.cpp applies it to the fused cloud before rendering;
SURVEY.md §2.2 row 3).

PCL semantics reproduced here (the numpy oracle in tests/oracle.py is the
contract):
  * per-axis voxel index  ijk = floor(p / leaf) - floor(min_p / leaf)
  * one output point per occupied voxel = centroid (mean) of its points
  * output ordered by ascending (ix, iy, iz)

TPU has no hash maps, so uniquing is done the sort-based way:
``lax.sort`` on the three integer voxel indices as a lexicographic key
(3 keys avoids any linearised-key overflow), then segment boundaries by
neighbour comparison, then ``segment_sum`` into a fixed-capacity buffer.
Everything is fixed shape: invalid inputs sort to the end under a sentinel
key, voxels beyond ``capacity`` fall into a discard bucket, and the output
carries a validity mask. One compiled program serves every frame.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.types import PointCloud

_SENTINEL = jnp.iinfo(jnp.int32).max


def voxel_indices(xyz: jax.Array, mask: jax.Array, leaf: jax.Array):
    """Per-axis int32 voxel indices (PCL convention), sentinel for invalid."""
    inv = 1.0 / jnp.asarray(leaf, jnp.float32)
    f = jnp.floor(xyz * inv).astype(jnp.int32)  # floor(p/leaf)
    big = jnp.iinfo(jnp.int32).max
    fm = jnp.where(mask[..., None], f, big)
    min_ijk = jnp.min(fm, axis=-2, keepdims=True)  # floor(min_p/leaf) per axis
    ijk = f - min_ijk
    ijk = jnp.where(mask[..., None], ijk, _SENTINEL)
    return ijk


@partial(jax.jit, static_argnames=("capacity",))
def voxel_downsample(pc: PointCloud, leaf, capacity: int) -> PointCloud:
    """Downsample to one centroid per occupied voxel; output padded to capacity.

    Args:
      pc: PointCloud with xyz [N, 3], mask [N], optional rgb.
      leaf: voxel edge length in meters (scalar, traced — no recompile on change).
      capacity: static output size. Voxels past capacity (in key order) drop.
    """
    xyz, mask = pc.xyz, pc.mask
    ijk = voxel_indices(xyz, mask, leaf)
    kx, ky, kz = ijk[..., 0], ijk[..., 1], ijk[..., 2]

    operands = [kx, ky, kz, xyz[..., 0], xyz[..., 1], xyz[..., 2]]
    has_rgb = pc.rgb is not None
    if has_rgb:
        operands += [pc.rgb[..., 0], pc.rgb[..., 1], pc.rgb[..., 2]]
    sorted_ops = jax.lax.sort(operands, num_keys=3)
    skx, sky, skz = sorted_ops[0], sorted_ops[1], sorted_ops[2]
    sxyz = jnp.stack(sorted_ops[3:6], axis=-1)
    srgb = jnp.stack(sorted_ops[6:9], axis=-1) if has_rgb else None

    valid = skx != _SENTINEL
    prev = lambda a: jnp.concatenate([jnp.full_like(a[:1], -1), a[:-1]])
    is_new = (skx != prev(skx)) | (sky != prev(sky)) | (skz != prev(skz))
    seg = jnp.cumsum((is_new & valid).astype(jnp.int32)) - 1
    # invalid points and voxels past capacity → discard bucket `capacity`
    seg = jnp.where(valid & (seg < capacity), seg, capacity)

    nseg = capacity + 1
    ssum = partial(jax.ops.segment_sum, segment_ids=seg, num_segments=nseg,
                   indices_are_sorted=True)
    counts = ssum(valid.astype(jnp.float32))[:capacity]
    sums = ssum(sxyz)[:capacity]
    denom = jnp.maximum(counts, 1.0)[..., None]
    out_xyz = sums / denom
    out_mask = counts > 0.0
    out_xyz = jnp.where(out_mask[..., None], out_xyz, 0.0)
    out_rgb = None
    if has_rgb:
        out_rgb = ssum(srgb)[:capacity] / denom
        out_rgb = jnp.where(out_mask[..., None], out_rgb, 0.0)
    return PointCloud(xyz=out_xyz, mask=out_mask, rgb=out_rgb)


def decimate_depth(depth: jax.Array, stride: int) -> jax.Array:
    """Grid-stride decimation of a depth image before deprojection.

    Equivalent of the reference camera server's downsample flag (stride
    subsampling of the frame to cut bandwidth; SURVEY.md §2.1 'Voxel-grid
    downsample / decimation' row, server side).
    """
    if stride <= 1:
        return depth
    return depth[..., ::stride, ::stride]
