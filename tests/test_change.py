"""Spatial change detection (ops/change.py) vs a numpy set-diff oracle.

Contract: a query point is "changed" iff its absolute voxel
(floor(p * (1/leaf)), the PCL reciprocal-multiply convention) contains no
valid reference point — pcl::OctreePointCloudChangeDetector semantics on
a shared world-anchored grid.
"""
import numpy as np

import jax.numpy as jnp

from pointcloud_stitching_tpu.models.voxel_map import TemporalAccumulator
from pointcloud_stitching_tpu.ops.change import (detect_changes,
                                                 detect_changes_map)
from pointcloud_stitching_tpu.utils.types import PointCloud


def oracle_changes(ref_xyz, ref_mask, q_xyz, q_mask, leaf):
    inv = np.float32(1.0) / np.float32(leaf)
    rk = np.floor(ref_xyz.astype(np.float32) * inv).astype(np.int64)
    qk = np.floor(q_xyz.astype(np.float32) * inv).astype(np.int64)
    ref_set = {tuple(k) for k, m in zip(rk, ref_mask) if m}
    return np.array([m and tuple(k) not in ref_set
                     for k, m in zip(qk, q_mask)], bool)


def padded(xyz, capacity=None):
    xyz = np.asarray(xyz, np.float32)
    return PointCloud.from_points(xyz, capacity=capacity or len(xyz))


def test_disjoint_and_overlap():
    ref = padded([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    q = padded([[0.01, 0.01, 0.01],     # same voxel as ref[0] at leaf .05
                [2.0, 2.0, 2.0],        # new
                [1.01, 1.01, 1.01]])    # same voxel as ref[1]
    got = np.asarray(detect_changes(ref, q, 0.05))
    assert got.tolist() == [False, True, False]


def test_fuzz_vs_oracle(rng):
    for trial in range(6):
        nr, nq = rng.integers(50, 400, 2)
        leaf = float(rng.uniform(0.03, 0.2))
        ref_xyz = rng.uniform(-2, 2, (nr, 3)).astype(np.float32)
        # query: half resampled near ref points, half fresh
        near = ref_xyz[rng.integers(0, nr, nq // 2)] + rng.uniform(
            -0.01, 0.01, (nq // 2, 3)).astype(np.float32)
        fresh = rng.uniform(-2, 2, (nq - nq // 2, 3)).astype(np.float32)
        q_xyz = np.concatenate([near, fresh]).astype(np.float32)
        rmask = rng.random(nr) > 0.1
        qmask = rng.random(nq) > 0.1
        ref = PointCloud(xyz=jnp.asarray(ref_xyz), mask=jnp.asarray(rmask))
        q = PointCloud(xyz=jnp.asarray(q_xyz), mask=jnp.asarray(qmask))
        want = oracle_changes(ref_xyz, rmask, q_xyz, qmask, leaf)
        got = np.asarray(detect_changes(ref, q, leaf))
        np.testing.assert_array_equal(got, want)


def test_different_capacities_and_padding(rng):
    ref_xyz = rng.uniform(-1, 1, (37, 3)).astype(np.float32)
    q_xyz = rng.uniform(-1, 1, (11, 3)).astype(np.float32)
    ref = PointCloud.from_points(ref_xyz, capacity=128)
    q = PointCloud.from_points(q_xyz, capacity=64)
    want = np.zeros(64, bool)
    want[:11] = oracle_changes(ref_xyz, np.ones(37, bool), q_xyz,
                               np.ones(11, bool), 0.05)
    got = np.asarray(detect_changes(ref, q, 0.05))
    np.testing.assert_array_equal(got, want)


def test_leaf_is_traced(rng):
    # same jitted fn, two leaves: coarse merges everything into ref voxels
    ref = padded([[0.0, 0.0, 0.0]])
    q = padded([[0.4, 0.4, 0.4]])
    assert np.asarray(detect_changes(ref, q, 0.1))[0]
    assert not np.asarray(detect_changes(ref, q, 1.0))[0]


def test_out_of_range_never_reported():
    # the absolute grid covers ±16384 leaves in x: 2000 m at a 5 cm leaf
    # is past it (a physically meaningless return), never "changed"
    ref = padded([[0.0, 0.0, 0.0]])
    q = padded([[2000.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    got = np.asarray(detect_changes(ref, q, 0.05))
    assert got.tolist() == [False, True]


def test_map_baseline(rng):
    leaf = 0.05
    base_xyz = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    acc = TemporalAccumulator(capacity=1 << 12, leaf=leaf)
    acc.update(PointCloud.from_points(base_xyz))
    # query: some points inside baseline voxels, some new
    q_xyz = np.concatenate([
        base_xyz[:50] + rng.uniform(-0.001, 0.001, (50, 3)),
        rng.uniform(2, 3, (40, 3))]).astype(np.float32)
    q = PointCloud.from_points(q_xyz)
    got = np.asarray(detect_changes_map(acc.state, q))
    want = oracle_changes(base_xyz, np.ones(300, bool), q_xyz,
                          np.ones(90, bool), leaf)
    np.testing.assert_array_equal(got, want)


def test_segment_cli_changed_vs(tmp_path, rng):
    """Baseline scene + a new object: --changed-vs clusters only the object."""
    from pointcloud_stitching_tpu.io.plyio import save_ply
    from pointcloud_stitching_tpu.tools import segment_cli
    base = rng.uniform(-1, 1, (600, 3)).astype(np.float32)
    obj = (rng.uniform(-0.08, 0.08, (120, 3)) + [3.0, 0.0, 0.5]
           ).astype(np.float32)
    ref_ply = str(tmp_path / "ref.ply")
    new_ply = str(tmp_path / "new.ply")
    save_ply(ref_ply, base)
    save_ply(new_ply, np.concatenate(
        [base + rng.uniform(-1e-3, 1e-3, base.shape).astype(np.float32),
         obj]))
    out = str(tmp_path / "out")
    n = segment_cli.main([new_ply, out, "--changed-vs", ref_ply,
                          "--change-leaf", "0.05", "--tolerance", "0.1",
                          "--min-size", "20"])
    assert n == 1
    from pointcloud_stitching_tpu.io.plyio import load_ply
    got, _ = load_ply(str(tmp_path / "out" / "cluster_00.ply"))
    assert len(got) >= 100  # the object, none of the baseline scene
    assert np.all(np.linalg.norm(got - [3.0, 0.0, 0.5], axis=-1) < 0.3)


def test_map_min_weight(rng):
    # one-glimpse voxels below min_weight don't count as baseline
    leaf = 0.05
    solid = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    glimpse = np.array([[2.0, 2.0, 2.0]], np.float32)
    acc = TemporalAccumulator(capacity=1 << 12, leaf=leaf)
    acc.update(PointCloud.from_points(np.concatenate([solid, glimpse])))
    acc.update(PointCloud.from_points(solid))
    q = PointCloud.from_points(np.array([[2.001, 2.001, 2.001]], np.float32))
    assert not np.asarray(detect_changes_map(acc.state, q))[0]
    assert np.asarray(detect_changes_map(acc.state, q, min_weight=1.5))[0]
