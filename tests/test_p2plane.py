"""Grid normals + point-to-plane ICP."""
import numpy as np
import jax.numpy as jnp

from pointcloud_stitching_tpu import Intrinsics, PointCloud
from pointcloud_stitching_tpu.ops import (grid_normals, icp_batched,
                                          icp_point_to_plane_batched,
                                          deproject)
from pointcloud_stitching_tpu.ops.se3 import se3_apply
from oracle import random_se3, synth_depth_frame, transform_np


def test_grid_normals_on_plane():
    """A flat wall at z=2m must produce normals (0,0,-1) (toward sensor)."""
    h, w = 32, 64
    depth = np.full((h, w), 2000, np.uint16)
    intr = Intrinsics.create(fx=50.0, fy=50.0, ppx=w / 2, ppy=h / 2,
                             width=w, height=h)
    pc = deproject(depth, intr)
    grid = pc.xyz.reshape(h, w, 3)
    mask = pc.mask.reshape(h, w)
    n, valid = grid_normals(grid, mask)
    v = np.asarray(valid)
    assert v[:-1, :-1].all()
    nn = np.asarray(n)[v]
    np.testing.assert_allclose(nn[:, 2], -1.0, atol=1e-3)


def test_grid_normals_invalid_pixels():
    h, w = 16, 32
    depth = np.full((h, w), 1500, np.uint16)
    depth[5, 7] = 0
    intr = Intrinsics.create(fx=30.0, fy=30.0, ppx=w / 2, ppy=h / 2,
                             width=w, height=h)
    pc = deproject(depth, intr)
    n, valid = grid_normals(pc.xyz.reshape(h, w, 3), pc.mask.reshape(h, w))
    v = np.asarray(valid)
    # the hole and the pixels whose forward neighbours are the hole
    assert not v[5, 7] and not v[5, 6] and not v[4, 7]


def _pair_with_normals(seed, n_noise=0.0):
    h, w = 120, 212
    depth = synth_depth_frame(h, w, seed=seed)
    intr = Intrinsics.create(fx=106.0, fy=106.0, ppx=w / 2, ppy=h / 2,
                             width=w, height=h)
    pc = deproject(depth, intr, z_min=0.1, z_max=10.0)
    grid = pc.xyz.reshape(h, w, 3)
    mask = pc.mask.reshape(h, w)
    normals, nvalid = grid_normals(grid, mask)
    s = 2  # stride for a manageable cloud
    xyz = np.asarray(grid)[::s, ::s].reshape(-1, 3)
    nrm = np.asarray(normals)[::s, ::s].reshape(-1, 3)
    m = np.asarray(mask & nvalid)[::s, ::s].reshape(-1)
    return xyz, nrm, m


def test_point_to_plane_beats_point_to_point_on_smooth_scene():
    """On a smooth surface with a translational offset, point-to-plane must
    converge at least as tight in the SAME iteration budget."""
    xyz, nrm, m = _pair_with_normals(seed=21)
    drift = np.eye(4, dtype=np.float32)
    drift[:3, 3] = [0.03, -0.02, 0.015]
    src_xyz = transform_np(np.linalg.inv(drift).astype(np.float32), xyz)

    src = PointCloud(xyz=jnp.asarray(src_xyz[None]), mask=jnp.asarray(m[None]))
    dst = PointCloud(xyz=jnp.asarray(xyz[None]), mask=jnp.asarray(m[None]))
    p2l = icp_point_to_plane_batched(
        src, dst, jnp.asarray(nrm[None]), iterations=5, max_corr_dist=0.3,
        query_tile=512, ref_tile=512)
    p2p = icp_batched(src, dst, iterations=5, max_corr_dist=0.3,
                      query_tile=512, ref_tile=512)
    err_l = np.abs(np.asarray(p2l.T)[0] @ np.linalg.inv(drift) - np.eye(4)).max()
    err_p = np.abs(np.asarray(p2p.T)[0] @ np.linalg.inv(drift) - np.eye(4)).max()
    assert err_l < 5e-3, err_l
    assert err_l <= err_p * 1.5  # at minimum competitive, typically better


def test_point_to_plane_degenerate_returns_identity():
    src = PointCloud(xyz=jnp.zeros((1, 128, 3)), mask=jnp.zeros((1, 128), bool))
    dst = PointCloud(xyz=jnp.zeros((1, 128, 3)), mask=jnp.zeros((1, 128), bool))
    res = icp_point_to_plane_batched(src, dst, jnp.zeros((1, 128, 3)),
                                     iterations=3, query_tile=128,
                                     ref_tile=128)
    np.testing.assert_allclose(np.asarray(res.T)[0], np.eye(4), atol=1e-5)


def test_stitcher_point_to_plane_drift_correction():
    """Full pipeline with icp_variant=point_to_plane recovers an injected
    drift at least as well as point-to-point."""
    from pointcloud_stitching_tpu.models import stitch_step
    from pointcloud_stitching_tpu.utils.config import StitchConfig
    h, w = 120, 212
    depth = synth_depth_frame(h, w, seed=42)
    depths = np.stack([depth, depth])
    intr = Intrinsics.create(fx=106.0, fy=106.0, ppx=w / 2, ppy=h / 2,
                             width=w, height=h)
    intr_b = intr.stack([intr])
    drift = np.eye(4, dtype=np.float32)
    drift[:3, 3] = [0.04, -0.03, 0.02]
    ext = np.stack([np.eye(4, dtype=np.float32), drift])

    def run(variant):
        cfg = StitchConfig(num_cameras=2, height=h, width=w,
                           out_voxel_leaf=0.02, out_capacity=65536,
                           icp_enabled=True, icp_variant=variant,
                           icp_stride=2, icp_voxel_leaf=0.04,
                           icp_capacity=4096, icp_iterations=8,
                           icp_max_corr_dist=0.3,
                           icp_query_tile=256, icp_ref_tile=512)
        out = stitch_step(cfg, intr_b, jnp.asarray(ext), jnp.asarray(depths))
        return np.abs(np.asarray(out.extrinsics)[1] - np.eye(4)).max()

    err_p2l = run("point_to_plane")
    err_p2p = run("point_to_point")
    assert err_p2l < 5e-3, err_p2l
    assert err_p2l <= err_p2p * 1.5
