"""NDT registration (pcl::NormalDistributionsTransform role)."""
import jax.numpy as jnp
import numpy as np

from pointcloud_stitching_tpu import PointCloud
from pointcloud_stitching_tpu.ops.ndt import ndt, ndt_align, ndt_build
from oracle import random_se3, transform_np
from test_fpfh import _bumpy_surface


def _pc(xyz, mask=None):
    xyz = np.asarray(xyz, np.float32)
    m = np.ones(len(xyz), bool) if mask is None else np.asarray(mask)
    return PointCloud(xyz=jnp.asarray(xyz), mask=jnp.asarray(m))


def _err(T_got, T_true, xyz):
    a = transform_np(np.asarray(T_got), xyz)
    b = transform_np(np.asarray(T_true), xyz)
    return float(np.max(np.linalg.norm(a - b, axis=-1)))


def test_build_matches_numpy_cells():
    """Per-cell count/mean/covariance vs a direct numpy grouping, incl.
    the eigenvalue floor and the min_points gate."""
    rng = np.random.default_rng(2)
    xyz = rng.uniform(0, 1.0, (400, 3)).astype(np.float32)
    mask = rng.uniform(size=400) > 0.1
    cell = 0.25
    m = ndt_build(_pc(xyz, mask), cell, min_points=6, eigen_floor=0.01)
    keys = np.asarray(m.keys)
    valid = np.asarray(m.valid)
    mu = np.asarray(m.mu)
    icov = np.asarray(m.inv_cov)
    base = np.asarray(m.base)
    dims = np.asarray(m.dims)

    f = np.floor(xyz / cell).astype(np.int64) - base
    key_np = (f[:, 0] * dims[1] + f[:, 1]) * dims[2] + f[:, 2]
    groups = {}
    for i in range(400):
        if mask[i]:
            groups.setdefault(int(key_np[i]), []).append(i)
    want_valid = {k for k, v in groups.items() if len(v) >= 6}
    got_valid = set(keys[valid].tolist())
    assert got_valid == want_valid
    for k in want_valid:
        slot = int(np.searchsorted(keys, k))
        pts = xyz[groups[k]]
        np.testing.assert_allclose(mu[slot], pts.mean(0), atol=1e-5)
        cov = np.cov(pts.T, bias=True)
        vals, vecs = np.linalg.eigh(cov)
        vals = np.maximum(vals, 0.01 * vals[2])
        want_icov = vecs @ np.diag(1.0 / vals) @ vecs.T
        np.testing.assert_allclose(icov[slot], want_icov,
                                   rtol=2e-2, atol=2e-2)


def test_build_covariance_far_from_origin():
    """At-range robustness (r5 review): cell covariances come from
    per-cell-centered residuals, not E[pp^T] - mu mu^T, so a map 100 m
    out keeps the same cell shapes as one at the origin."""
    rng = np.random.default_rng(5)
    local = rng.uniform(0, 1.0, (400, 3)).astype(np.float32)
    off = np.array([80.0, -60.0, 50.0], np.float32)
    cell = 0.25
    m0 = ndt_build(_pc(local), cell, min_points=6, eigen_floor=0.01)
    m1 = ndt_build(_pc(local + off), cell, min_points=6, eigen_floor=0.01)
    v0, v1 = np.asarray(m0.valid), np.asarray(m1.valid)
    # the shifted grid may split cells differently at boundaries (the
    # offset is 320/240/200 cells — exact multiples, so it does not),
    # but every valid cell's inverse covariance must survive the shift
    assert v0.sum() == v1.sum() and v0.sum() > 10
    i0 = np.asarray(m0.inv_cov)[v0]
    i1 = np.asarray(m1.inv_cov)[v1]
    k0 = np.argsort(np.asarray(m0.keys)[v0])
    k1 = np.argsort(np.asarray(m1.keys)[v1])
    np.testing.assert_allclose(i1[k1], i0[k0], rtol=0.02, atol=0.5)


def test_recovers_small_offset():
    """NDT's contract: converge from within ~a cell of the truth."""
    xyz, _ = _bumpy_surface(seed=20, n=1500)
    src = _pc(xyz)
    T_true = random_se3(seed=6, max_angle=0.08, max_trans=0.04)
    dst = _pc(transform_np(T_true, xyz))
    res = ndt(src, dst, 0.15, max_iterations=40)
    err = _err(res.T, T_true, xyz[:200])
    assert err < 0.02, err
    assert int(res.num_inliers) > 1000


def test_map_reuse_localizes_multiple_frames():
    """Build one map, localize two different partial frames against it —
    the scan-to-map workflow pcl::NDT exists for."""
    xyz, _ = _bumpy_surface(seed=21, n=2400)
    world = _pc(xyz)
    m = ndt_build(world, 0.15)
    rng = np.random.default_rng(0)
    for seed in (1, 2):
        sel = rng.uniform(size=len(xyz)) < 0.4
        frame = xyz[sel] + rng.normal(0, 0.002, (sel.sum(), 3))
        T_true = random_se3(seed=seed + 30, max_angle=0.06, max_trans=0.04)
        # frame lives in its own pose: world = T_true * frame_local
        frame_local = transform_np(np.linalg.inv(T_true), frame)
        res = ndt_align(_pc(frame_local.astype(np.float32)), m,
                        max_iterations=40)
        err = _err(res.T, T_true, frame_local[:150].astype(np.float32))
        assert err < 0.03, (seed, err)


def test_identity_when_already_aligned():
    xyz, _ = _bumpy_surface(seed=22, n=900)
    res = ndt(_pc(xyz), _pc(xyz), 0.2, max_iterations=20)
    np.testing.assert_allclose(np.asarray(res.T), np.eye(4), atol=5e-3)


def test_empty_inputs_fail_safe():
    xyz, _ = _bumpy_surface(seed=23, n=128)
    empty = PointCloud(xyz=jnp.asarray(xyz), mask=jnp.zeros(128, bool))
    res = ndt(_pc(xyz), empty, 0.2, max_iterations=10)   # empty map
    np.testing.assert_allclose(np.asarray(res.T), np.eye(4), atol=1e-5)
    assert int(res.num_inliers) == 0
    res2 = ndt(empty, _pc(xyz), 0.2, max_iterations=10)  # empty source
    np.testing.assert_allclose(np.asarray(res2.T), np.eye(4), atol=1e-5)
