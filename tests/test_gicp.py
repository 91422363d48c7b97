"""Generalized ICP (plane-to-plane, pcl::GeneralizedICP role)."""
import jax.numpy as jnp
import numpy as np

from pointcloud_stitching_tpu import PointCloud
from pointcloud_stitching_tpu.ops import estimate_normals, icp_converge
from pointcloud_stitching_tpu.ops.gicp import gicp, gicp_covariances
from oracle import random_se3, transform_np
from test_fpfh import _bumpy_surface


def _pc(xyz):
    return PointCloud(xyz=jnp.asarray(np.asarray(xyz, np.float32)),
                      mask=jnp.ones(len(xyz), bool))


def _err(T_got, T_true, xyz):
    a = transform_np(np.asarray(T_got), xyz)
    b = transform_np(np.asarray(T_true), xyz)
    return float(np.max(np.linalg.norm(a - b, axis=-1)))


def _corner(step=0.02, extent=0.4, phase=(0.0, 0.0, 0.0)):
    """Three mutually perpendicular planes (a room corner) with a
    per-plane sampling phase: shifting the phase moves every SAMPLE but
    not the SURFACES — the scene GICP registers and sample-matching
    doesn't."""
    g = np.arange(4 * step, extent, step, dtype=np.float32)
    planes = []
    for axis, ph in zip(range(3), phase):
        u, v = np.meshgrid(g + ph * step, g + ph * step, indexing="ij")
        pts = np.zeros((u.size, 3), np.float32)
        pts[:, (axis + 1) % 3] = u.ravel()
        pts[:, (axis + 2) % 3] = v.ravel()
        planes.append(pts)
    return np.concatenate(planes)


def test_covariances_shape_and_fallback():
    n = np.zeros((4, 3), np.float32)
    n[0] = [0, 0, 1]
    valid = np.array([True, False, True, False])
    c = np.asarray(gicp_covariances(jnp.asarray(n), jnp.asarray(valid),
                                    epsilon=1e-3))
    np.testing.assert_allclose(c[0], np.diag([1.0, 1.0, 1e-3]), atol=1e-6)
    np.testing.assert_allclose(c[1], np.eye(3), atol=1e-6)  # invalid -> iso


def test_recovers_known_transform():
    xyz, _ = _bumpy_surface(seed=11, n=600)
    src = _pc(xyz)
    T_true = random_se3(seed=3, max_angle=0.3, max_trans=0.1)
    dst = _pc(transform_np(T_true, xyz))
    ns, oks = estimate_normals(src, 0.15)
    nd, okd = estimate_normals(dst, 0.15)
    res = gicp(src, dst, ns, nd, oks, okd, max_corr_dist=0.5,
               max_iterations=50)
    assert _err(res.T, T_true, xyz) < 2e-3
    assert int(res.num_inliers) == 600


def test_isotropic_epsilon_matches_point_to_point():
    """cov_epsilon=1 makes every M the identity metric — the GN step must
    land where plain ICP lands."""
    xyz, _ = _bumpy_surface(seed=12, n=400)
    src = _pc(xyz)
    T_true = random_se3(seed=5, max_angle=0.2, max_trans=0.05)
    dst = _pc(transform_np(T_true, xyz))
    ns, oks = estimate_normals(src, 0.15)
    nd, okd = estimate_normals(dst, 0.15)
    res_g = gicp(src, dst, ns, nd, oks, okd, cov_epsilon=1.0,
                 max_corr_dist=0.5, max_iterations=60)
    res_p = icp_converge(src, dst, max_corr_dist=0.5, max_iterations=60)
    a = transform_np(np.asarray(res_g.T), xyz)
    b = transform_np(np.asarray(res_p.T), xyz)
    assert float(np.max(np.linalg.norm(a - b, axis=-1))) < 1e-3


def test_registers_surfaces_not_samples():
    """Corner scene where dst is the SAME three planes sampled at
    half-step offset phases: there is no point-to-point correspondence
    better than half the sampling step, but the surfaces coincide under
    T_true. GICP must recover T_true to well under the sampling step —
    it registers geometry, not sample positions."""
    step = 0.02
    src = _pc(_corner(step=step, phase=(0.0, 0.0, 0.0)))
    dst_pts = _corner(step=step, phase=(0.5, 0.5, 0.5))
    T_true = random_se3(seed=7, max_angle=0.15, max_trans=0.05)
    dst = _pc(transform_np(T_true, dst_pts))
    ns, oks = estimate_normals(src, 3.1 * step)
    nd, okd = estimate_normals(dst, 3.1 * step)
    res = gicp(src, dst, ns, nd, oks, okd, max_corr_dist=0.2,
               max_iterations=60)
    probe = _corner(step=step)[:200]
    err = _err(res.T, T_true, probe)
    assert err < 0.3 * step, err


def test_starved_returns_identity():
    xyz, _ = _bumpy_surface(seed=13, n=64)
    src = PointCloud(xyz=jnp.asarray(xyz), mask=jnp.zeros(64, bool))
    dst = _pc(xyz)
    ns = jnp.zeros((64, 3))
    res = gicp(src, dst, ns, ns, max_iterations=10)
    np.testing.assert_allclose(np.asarray(res.T), np.eye(4), atol=1e-6)
    assert int(res.num_inliers) == 0


def test_register_cli_gicp_flag(tmp_path):
    """pcs-register --no-picks --gicp: phase-shifted corner scans in, a
    surface-accurate .cal out."""
    import os
    from pointcloud_stitching_tpu.io import load_cal
    from pointcloud_stitching_tpu.io.plyio import save_ply
    from pointcloud_stitching_tpu.tools import register_cli
    step = 0.02
    src_pts = _corner(step=step, phase=(0.0, 0.0, 0.0))
    T_true = random_se3(seed=9, max_angle=0.1, max_trans=0.03)
    dst_pts = transform_np(T_true, _corner(step=step, phase=(0.5, 0.5, 0.5)))
    sp, dp = str(tmp_path / "s.ply"), str(tmp_path / "d.ply")
    save_ply(sp, src_pts)
    save_ply(dp, dst_pts.astype(np.float32))
    out = str(tmp_path / "pair.cal")
    register_cli.main([sp, dp, out, "--no-picks", "--gicp",
                       "--gicp-normal-radius", "0.062",
                       "--max-corr-dist", "0.2", "--max-iter", "60"])
    T = load_cal(out)
    err = _err(T, T_true, _corner(step=step)[:200])
    assert err < 0.3 * step, err
