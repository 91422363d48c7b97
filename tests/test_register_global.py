"""Global (pick-free) registration via parallel multi-start ICP."""
import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_stitching_tpu import PointCloud
from pointcloud_stitching_tpu.models import register_global
from oracle import deproject_np, random_se3, synth_depth_frame, transform_np


def _scene_cloud(seed=0, stride=4, h=120, w=212):
    """Wavy depth scene + one distinctive off-center blob. The raw wave
    pattern is quasi-periodic (self-similar under in-plane shifts), which
    is exactly the symmetry a geometry-only global method can lock onto —
    real calibration scenes have landmarks, so this one gets one too."""
    depth = synth_depth_frame(h, w, seed=seed)
    xyz, mask = deproject_np(depth, 106.0, 106.0, w / 2, h / 2)
    xyz = xyz.reshape(-1, 3)[::stride]
    mask = mask.reshape(-1)[::stride]
    rng = np.random.default_rng(seed + 100)
    blob = np.array([0.6, 0.4, 1.2]) + rng.normal(0, 0.05, (200, 3))
    xyz = np.concatenate([xyz, blob]).astype(np.float32)
    mask = np.concatenate([mask, np.ones(200, bool)])
    return PointCloud(xyz=jnp.asarray(xyz), mask=jnp.asarray(mask))


def _max_point_err(T_got, T_true, xyz):
    a = transform_np(np.asarray(T_got), xyz)
    b = transform_np(np.asarray(T_true), xyz)
    return float(np.max(np.linalg.norm(a - b, axis=-1)))


def test_recovers_large_rotation_without_picks():
    """A ~140-degree misalignment is far outside single-ICP capture range;
    the multi-start sweep must land it anyway."""
    src = _scene_cloud(seed=2)
    T_true = random_se3(seed=5, max_angle=2.5, max_trans=0.4)
    dst = PointCloud(
        xyz=jnp.asarray(transform_np(T_true, np.asarray(src.xyz))),
        mask=src.mask)
    res = register_global(src, dst, jax.random.key(0), num_starts=48,
                          coarse_leaf=0.08, coarse_capacity=512,
                          max_iterations=30)
    err = _max_point_err(res.T, T_true, np.asarray(src.xyz)[:200])
    assert err < 0.005, err


def test_identity_start_keeps_aligned_pairs():
    """start 0 is pinned to identity: a nearly-aligned pair must converge
    to the small true offset, never get yanked by a wild random start."""
    src = _scene_cloud(seed=3)
    T_true = random_se3(seed=8, max_angle=0.05, max_trans=0.02)
    dst = PointCloud(
        xyz=jnp.asarray(transform_np(T_true, np.asarray(src.xyz))),
        mask=src.mask)
    res = register_global(src, dst, jax.random.key(1), num_starts=16,
                          coarse_leaf=0.08, coarse_capacity=512,
                          max_iterations=30)
    err = _max_point_err(res.T, T_true, np.asarray(src.xyz)[:200])
    assert err < 0.005, err


def test_register_cli_global_end_to_end(tmp_path):
    """register_cli --global: two misaligned PLYs in, a correct .cal out,
    no picks anywhere."""
    from pointcloud_stitching_tpu.io import load_cal
    from pointcloud_stitching_tpu.io.plyio import save_ply
    from pointcloud_stitching_tpu.tools import register_cli
    src = _scene_cloud(seed=6)
    T_true = random_se3(seed=13, max_angle=2.0, max_trans=0.3)
    xyz = np.asarray(src.xyz)[np.asarray(src.mask)]
    sp, dp = str(tmp_path / "s.ply"), str(tmp_path / "d.ply")
    save_ply(sp, xyz)
    save_ply(dp, transform_np(T_true, xyz))
    out = str(tmp_path / "pair.cal")
    register_cli.main([sp, dp, out, "--global", "--starts", "48",
                       "--coarse-leaf", "0.08", "--max-iter", "30"])
    T = load_cal(out)
    err = _max_point_err(T, T_true, xyz[:200])
    assert err < 0.005, err


def test_robust_to_noise_and_reports_fit():
    src = _scene_cloud(seed=4)
    T_true = random_se3(seed=11, max_angle=1.5, max_trans=0.3)
    rng = np.random.default_rng(0)
    noisy = transform_np(T_true, np.asarray(src.xyz)) \
        + rng.normal(0, 0.002, (len(src.xyz), 3))
    dst = PointCloud(xyz=jnp.asarray(noisy.astype(np.float32)),
                     mask=src.mask)
    res = register_global(src, dst, jax.random.key(2), num_starts=48,
                          coarse_leaf=0.08, coarse_capacity=512,
                          max_iterations=30)
    err = _max_point_err(res.T, T_true, np.asarray(src.xyz)[:200])
    assert err < 0.02, err
    assert res.icp is not None and int(res.icp.num_inliers) > 500


def test_pca_axes_always_right_handed():
    """eigh returns arbitrary-handed eigenbases; _pca_axes must flip to
    det +1 or every PCA alignment start becomes a reflection."""
    from pointcloud_stitching_tpu.models.registration import _pca_axes
    rng = np.random.default_rng(0)
    for seed in range(8):
        xyz = jnp.asarray(rng.normal(0, 1, (200, 3)).astype(np.float32)
                          * np.array([3.0, 2.0, 1.0], np.float32))
        v = _pca_axes(xyz, jnp.ones((200,), jnp.float32))
        assert float(jnp.linalg.det(v)) > 0.99


def test_fpfh_starts_alone_recover_pose():
    """SAC-IA role: with num_starts=1 (identity only — hopeless at this
    misalignment) the FPFH-correspondence hypotheses must land the pose.
    Heterogeneous scene so descriptors are point-distinctive; k_corr=2
    keeps sampled triples mostly-true matches."""
    from test_fpfh import _bumpy_surface
    xyz, _ = _bumpy_surface(seed=9, n=800)
    src = PointCloud(xyz=jnp.asarray(xyz), mask=jnp.ones(len(xyz), bool))
    T_true = random_se3(seed=21, max_angle=2.5, max_trans=0.4)
    dst = PointCloud(
        xyz=jnp.asarray(transform_np(T_true, xyz).astype(np.float32)),
        mask=src.mask)
    res = register_global(src, dst, jax.random.key(3), num_starts=1,
                          fpfh_starts=32, fpfh_k_corr=2,
                          coarse_leaf=0.05, max_iterations=30)
    err = _max_point_err(res.T, T_true, xyz[:200])
    assert err < 0.01, err
