"""Sample-consensus plane segmentation (pcl::SACSegmentation role)."""
import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_stitching_tpu import PointCloud
from pointcloud_stitching_tpu.ops import extract_plane, segment_plane


def _plane_scene(seed=0, n_plane=4000, n_noise=1000, cap=8192,
                 normal=(0.0, 0.0, 1.0), d=-1.5, noise_sigma=0.002):
    """cap-slot cloud: a dominant plane n.p + d = 0 plus uniform clutter."""
    rng = np.random.default_rng(seed)
    nrm = np.asarray(normal, np.float64)
    nrm = nrm / np.linalg.norm(nrm)
    # basis of the plane
    a = np.array([1.0, 0.0, 0.0])
    if abs(nrm[0]) > 0.9:
        a = np.array([0.0, 1.0, 0.0])
    u = np.cross(nrm, a)
    u /= np.linalg.norm(u)
    v = np.cross(nrm, u)
    uv = rng.uniform(-2, 2, (n_plane, 2))
    pts = (uv[:, :1] * u + uv[:, 1:2] * v - d * nrm
           + rng.normal(0, noise_sigma, (n_plane, 3)))
    clutter = rng.uniform(-2.5, 2.5, (n_noise, 3))
    xyz = np.zeros((cap, 3), np.float32)
    mask = np.zeros((cap,), bool)
    all_pts = np.concatenate([pts, clutter]).astype(np.float32)
    xyz[:len(all_pts)] = all_pts
    mask[:len(all_pts)] = True
    return PointCloud(xyz=jnp.asarray(xyz), mask=jnp.asarray(mask)), nrm, d


def test_finds_dominant_plane():
    pc, nrm, d = _plane_scene()
    model, inliers, count = segment_plane(pc, 0.01, jax.random.key(0))
    model = np.asarray(model)
    # orientation-agnostic compare (a plane and its flip are the same set)
    if np.dot(model[:3], nrm) < 0:
        model = -model
    assert abs(np.dot(model[:3], nrm)) > 0.9999, model
    assert abs(model[3] - d) < 0.005, model
    # virtually all plane points captured, virtually no clutter
    assert 3800 <= int(count) <= 4100, int(count)
    assert int(jnp.sum(inliers)) == int(count)


def test_tilted_plane_and_extract():
    pc, nrm, d = _plane_scene(seed=3, normal=(0.3, -0.5, 0.8), d=0.7)
    model, inliers, count = segment_plane(pc, 0.01, jax.random.key(1))
    model_np = np.asarray(model)
    if np.dot(model_np[:3], nrm) < 0:
        model_np = -model_np
    assert abs(np.dot(model_np[:3], nrm)) > 0.9999
    assert abs(model_np[3] - d) < 0.005

    # ExtractIndices both ways: negative drops the plane, positive keeps it
    without = extract_plane(pc, model, 0.01, negative=True)
    only = extract_plane(pc, model, 0.01, negative=False)
    assert int(jnp.sum(only.mask)) == int(count)
    assert int(jnp.sum(without.mask)) == int(jnp.sum(pc.mask)) - int(count)
    # geometry untouched (mask-only filter)
    np.testing.assert_array_equal(np.asarray(without.xyz), np.asarray(pc.xyz))


def test_refit_beats_raw_triple():
    """With sensor-level noise, the least-squares polish must land closer
    to the true plane than the tightest threshold could guarantee."""
    pc, nrm, d = _plane_scene(seed=5, noise_sigma=0.005)
    model, _, _ = segment_plane(pc, 0.02, jax.random.key(2),
                                refine_iters=2)
    model = np.asarray(model)
    if np.dot(model[:3], nrm) < 0:
        model = -model
    angle = np.degrees(np.arccos(np.clip(np.dot(model[:3], nrm), -1, 1)))
    assert angle < 0.2, angle
    assert abs(model[3] - d) < 0.003


def test_degenerate_inputs():
    # fewer than 3 valid points: zero model, zero count, no NaNs
    xyz = jnp.zeros((64, 3), jnp.float32)
    mask = jnp.zeros((64,), bool).at[0].set(True)
    model, inliers, count = segment_plane(
        PointCloud(xyz=xyz, mask=mask), 0.01, jax.random.key(0),
        num_hypotheses=64)
    assert np.isfinite(np.asarray(model)).all()
    # the documented degenerate contract: zero model, not a fabricated one
    assert int(count) == 0 and np.all(np.asarray(model) == 0.0)

    # all-collinear cloud: every triple degenerate -> finite output
    t = jnp.linspace(0, 1, 64)[:, None]
    line = t * jnp.asarray([[1.0, 2.0, 3.0]])
    model2, _, _ = segment_plane(
        PointCloud(xyz=line, mask=jnp.ones((64,), bool)), 0.01,
        jax.random.key(0), num_hypotheses=64)
    assert np.isfinite(np.asarray(model2)).all()


def test_deterministic_given_key():
    pc, _, _ = _plane_scene(seed=7)
    m1, _, c1 = segment_plane(pc, 0.01, jax.random.key(9))
    m2, _, c2 = segment_plane(pc, 0.01, jax.random.key(9))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    assert int(c1) == int(c2)


def test_on_pipeline_output():
    """The common workflow: stitch a scene with a floor, segment it out."""
    from pointcloud_stitching_tpu import Intrinsics
    from pointcloud_stitching_tpu.models import stitch_step
    from pointcloud_stitching_tpu.utils.config import StitchConfig
    ncam, h, w = 2, 64, 96
    cfg = StitchConfig(num_cameras=ncam, height=h, width=w,
                       icp_enabled=False, out_voxel_leaf=0.02,
                       out_capacity=16384)
    i0 = Intrinsics.create(fx=80.0, fy=80.0, ppx=w / 2, ppy=h / 2,
                           width=w, height=h)
    intr = i0.stack([i0])
    # constant-depth frames = a wall at z = 1 m filling the whole view
    depths = np.full((ncam, h, w), 1000, np.uint16)
    ext = np.tile(np.eye(4, dtype=np.float32), (ncam, 1, 1))
    out = stitch_step(cfg, intr, jnp.asarray(ext), jnp.asarray(depths))
    model, _, count = segment_plane(out.cloud, 0.005, jax.random.key(0))
    model = np.asarray(model)
    if model[2] < 0:
        model = -model
    assert abs(model[2]) > 0.9999       # normal ~ +/-z
    assert abs(model[3] + 1.0) < 0.01   # z = 1 plane
    assert int(count) > 0.95 * int(out.metrics.points_out)
    rest = extract_plane(out.cloud, jnp.asarray(model), 0.005)
    assert int(jnp.sum(rest.mask)) < 0.05 * int(out.metrics.points_out)


def test_project_plane():
    from pointcloud_stitching_tpu.ops.sac import project_plane
    rng = np.random.default_rng(11)
    xyz = rng.uniform(-2, 2, (500, 3)).astype(np.float32)
    pc = PointCloud(xyz=jnp.asarray(xyz),
                    mask=jnp.asarray(rng.random(500) > 0.2))
    model = jnp.asarray([2.0, 0.0, 0.0, -1.0])  # un-normalized: x = 0.5
    out = project_plane(pc, model)
    got = np.asarray(out.xyz)
    m = np.asarray(pc.mask)
    # valid points land exactly on the plane, y/z untouched
    np.testing.assert_allclose(got[m, 0], 0.5, atol=1e-6)
    np.testing.assert_allclose(got[m, 1:], xyz[m, 1:], atol=1e-6)
    # masked rows are untouched (labels/rgb alignment contract)
    np.testing.assert_array_equal(got[~m], xyz[~m])
    assert np.array_equal(np.asarray(out.mask), m)
