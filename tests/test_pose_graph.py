"""Pose-graph optimization: joint extrinsic refinement over camera graphs."""
import numpy as np
import pytest

from pointcloud_stitching_tpu.models import (chain_initial_poses,
                                             optimize_pose_graph)
from oracle import random_se3


def _make_graph(n, extra_chords=(), seed=0):
    """Ground-truth poses + ring edges (i-1 -> i) with optional chords.

    Edge (i, j) measures T_i^-1 @ T_j (camera j in camera i's frame) —
    the register_pair(src=cloud_j, dst=cloud_i) convention.
    """
    gt = np.stack([np.eye(4, dtype=np.float32)]
                  + [random_se3(seed=seed + k, max_angle=0.5, max_trans=1.0)
                     for k in range(1, n)])
    edges = [(i - 1, i) for i in range(1, n)] + [(n - 1, 0)]
    edges += list(extra_chords)
    meas = np.stack([np.linalg.inv(gt[i]) @ gt[j] for i, j in edges])
    return gt, np.asarray(edges, np.int32), meas.astype(np.float32)


def _perturb(T, dt, dr, seed):
    rng = np.random.default_rng(seed)
    out = []
    for k, m in enumerate(T):
        n = random_se3(seed=int(rng.integers(1 << 30)), max_angle=dr,
                       max_trans=dt)
        out.append(m @ n)
    return np.stack(out).astype(np.float32)


def _pose_err(a, b):
    """Max translation distance + rotation Frobenius gap over the set."""
    return (float(np.abs(a[:, :3, 3] - b[:, :3, 3]).max()),
            float(np.abs(a[:, :3, :3] - b[:, :3, :3]).max()))


def test_consistent_graph_exact_recovery():
    """Noise-free measurements + perturbed init -> exact global poses."""
    gt, edges, meas = _make_graph(6, extra_chords=[(0, 3), (1, 4)])
    init = _perturb(gt, dt=0.05, dr=0.05, seed=3)
    init[0] = gt[0]  # same gauge as the ground truth
    res = optimize_pose_graph(init, edges, meas, iterations=10)
    dt, dr = _pose_err(np.asarray(res.poses), gt)
    assert dt < 1e-4 and dr < 1e-4
    assert float(res.residual_after.max()) < 1e-5
    assert float(res.residual_before.min()) > 1e-3  # init really was off


def test_noisy_ring_beats_chained_initialisation():
    """With noisy pairwise measurements, the joint solve is more consistent
    than chaining them (the reference's implicit calibration topology)."""
    gt, edges, meas = _make_graph(8)
    rng = np.random.default_rng(7)
    noisy = np.stack([
        m @ random_se3(seed=int(rng.integers(1 << 30)), max_angle=0.02,
                       max_trans=0.02) for m in meas]).astype(np.float32)
    init = chain_initial_poses(8, edges, noisy)
    res = optimize_pose_graph(init, edges, noisy, iterations=10)
    # the GN solution is a strictly better fit of the measurements
    assert (float(np.square(res.residual_after).sum())
            < 0.5 * float(np.square(res.residual_before).sum()))
    # and closer to the ground truth in the mean (the chain concentrates
    # accumulated error on the last cameras; the solve spreads the loop
    # residual — per-camera max against GT is seed noise at this scale, so
    # the claim is about the rig-wide average)
    dt_init = np.linalg.norm(init[:, :3, 3] - gt[:, :3, 3], axis=-1).mean()
    dt_opt = np.linalg.norm(
        np.asarray(res.poses)[:, :3, 3] - gt[:, :3, 3], axis=-1).mean()
    assert dt_opt < dt_init


def test_anchor_pose_is_exactly_fixed():
    gt, edges, meas = _make_graph(5)
    init = _perturb(gt, dt=0.03, dr=0.03, seed=11)
    res = optimize_pose_graph(init, edges, meas, iterations=5, anchor=2)
    np.testing.assert_array_equal(np.asarray(res.poses)[2], init[2])


def test_edge_weights_downweigh_outlier_measurement():
    """A garbage edge with near-zero weight must not corrupt the solution."""
    gt, edges, meas = _make_graph(6, extra_chords=[(0, 3)])
    bad = meas.copy()
    bad[-1] = random_se3(seed=99, max_angle=1.0, max_trans=3.0)  # the chord
    init = _perturb(gt, dt=0.05, dr=0.05, seed=5)
    init[0] = gt[0]
    w = np.ones(len(edges), np.float32)
    w[-1] = 1e-6
    res = optimize_pose_graph(init, edges, bad, weights=w, iterations=10)
    dt, dr = _pose_err(np.asarray(res.poses), gt)
    assert dt < 1e-3 and dr < 1e-3
    # unweighted, the same outlier drags the poses visibly off
    res_uw = optimize_pose_graph(init, edges, bad, iterations=10)
    dt_uw, _ = _pose_err(np.asarray(res_uw.poses), gt)
    assert dt_uw > 10 * max(dt, 1e-6)


def test_disconnected_node_keeps_initial_pose():
    gt, edges, meas = _make_graph(4)
    # add a 5th node no edge references
    init = np.concatenate([gt, random_se3(seed=21, max_angle=0.4,
                                          max_trans=0.8)[None]])
    res = optimize_pose_graph(init.astype(np.float32), edges, meas,
                              iterations=5)
    np.testing.assert_allclose(np.asarray(res.poses)[4], init[4], atol=1e-6)


def test_chain_initial_poses_traverses_reverse_edges():
    """BFS init must follow edges against their direction too."""
    gt, _, _ = _make_graph(4)
    # only reverse-direction edges reach nodes 2, 3: (3,2) measures T_2 in
    # T_3's frame, etc.
    edges = [(0, 1), (2, 1), (3, 2)]
    meas = np.stack([np.linalg.inv(gt[i]) @ gt[j] for i, j in edges])
    init = chain_initial_poses(4, edges, meas.astype(np.float32))
    dt, dr = _pose_err(np.asarray(init), gt)
    assert dt < 1e-4 and dr < 1e-4


def test_register_rig_end_to_end(rng):
    """Batched edge ICP + joint solve recovers a perturbed 4-camera rig."""
    from pointcloud_stitching_tpu import PointCloud
    from pointcloud_stitching_tpu.models import register_rig

    scene = rng.uniform(-1.5, 1.5, (4000, 3)).astype(np.float32)
    n = 4
    gt = np.stack([np.eye(4, dtype=np.float32)]
                  + [random_se3(seed=50 + k, max_angle=0.3, max_trans=0.5)
                     for k in range(1, n)])
    # each camera sees its own 2500-point subset of the scene, expressed in
    # its sensor frame (world -> sensor = inv(gt))
    clouds_xyz = []
    for k in range(n):
        sub = scene[rng.permutation(len(scene))[:2500]]
        inv = np.linalg.inv(gt[k])
        clouds_xyz.append(sub @ inv[:3, :3].T + inv[:3, 3])
    clouds = PointCloud(xyz=np.stack(clouds_xyz).astype(np.float32),
                        mask=np.ones((n, 2500), bool))
    init = _perturb(gt, dt=0.03, dr=0.03, seed=17)
    init[0] = gt[0]
    edges = np.asarray([(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)], np.int32)
    res = register_rig(clouds, edges, init, icp_iterations=15,
                       gn_iterations=8, max_corr_dist=0.3)
    dt_init, _ = _pose_err(init, gt)
    dt_opt, dr_opt = _pose_err(np.asarray(res.poses), gt)
    assert dt_opt < 0.2 * dt_init      # ICP+solve recovers most of the 3 cm
    assert dt_opt < 5e-3 and dr_opt < 5e-3
    assert float(res.residual_after.max()) < 1e-2


def test_graph_cli_end_to_end(tmp_path):
    """edges file of pairwise .cal measurements -> refined per-camera .cal
    files that recover the ground-truth rig (noise-free measurements)."""
    from pointcloud_stitching_tpu.io import load_cal, save_cal
    from pointcloud_stitching_tpu.tools import graph_cli

    gt, edges, meas = _make_graph(5, extra_chords=[(0, 2)])
    lines = []
    for k, (i, j) in enumerate(edges):
        p = tmp_path / f"pair_{k}.cal"
        save_cal(str(p), meas[k])
        lines.append(f"{i} {j} {p}")
    edges_file = tmp_path / "edges.txt"
    edges_file.write_text("# rig\n" + "\n".join(lines) + "\n")
    out = tmp_path / "cal_out"
    rc = graph_cli.main([str(edges_file), str(out), "--iterations", "8"])
    assert rc == 0
    refined = np.stack([load_cal(str(out / f"cam_{k}.cal"))
                        for k in range(5)])
    dt, dr = _pose_err(refined, gt)
    assert dt < 1e-4 and dr < 1e-4


def test_graph_cli_ply_mode(tmp_path, rng):
    """--ply-dir: measurements come from batched ICP on the clouds."""
    from pointcloud_stitching_tpu.io import load_cal, save_cal, save_ply
    from pointcloud_stitching_tpu.tools import graph_cli

    scene = rng.uniform(-1.5, 1.5, (3000, 3)).astype(np.float32)
    n = 3
    gt = np.stack([np.eye(4, dtype=np.float32)]
                  + [random_se3(seed=70 + k, max_angle=0.3, max_trans=0.5)
                     for k in range(1, n)])
    ply_dir = tmp_path / "clouds"
    ply_dir.mkdir()
    for k in range(n):
        sub = scene[rng.permutation(len(scene))[:2000]]
        inv = np.linalg.inv(gt[k])
        save_ply(str(ply_dir / f"cam_{k}.ply"),
                 sub @ inv[:3, :3].T + inv[:3, 3])
    init = _perturb(gt, dt=0.02, dr=0.02, seed=23)
    init[0] = gt[0]
    init_dir = tmp_path / "init"
    init_dir.mkdir()
    for k in range(n):
        save_cal(str(init_dir / f"cam_{k}.cal"), init[k])
    edges_file = tmp_path / "edges.txt"
    edges_file.write_text("0 1\n1 2\n2 0\n")
    out = tmp_path / "cal_out"
    rc = graph_cli.main([str(edges_file), str(out),
                         "--ply-dir", str(ply_dir),
                         "--init-dir", str(init_dir),
                         "--icp-iter", "15", "--iterations", "8"])
    assert rc == 0
    refined = np.stack([load_cal(str(out / f"cam_{k}.cal"))
                        for k in range(n)])
    dt_init, _ = _pose_err(init, gt)
    dt_opt, dr_opt = _pose_err(refined, gt)
    assert dt_opt < 0.3 * dt_init and dr_opt < 5e-3


def test_pose_graph_rejects_nothing_but_improves_ring_rig():
    """End-to-end shape: 8-camera ring, realistic drift-level noise, chords
    from 'extra' overlap measurements shrink the worst-camera error."""
    gt, edges_ring, meas_ring = _make_graph(8)
    rng = np.random.default_rng(13)
    noise = lambda: random_se3(seed=int(rng.integers(1 << 30)),
                               max_angle=0.01, max_trans=0.01)
    noisy_ring = np.stack([m @ noise() for m in meas_ring]).astype(np.float32)
    chords = [(0, 4), (2, 6)]
    meas_chords = np.stack(
        [np.linalg.inv(gt[i]) @ gt[j] @ noise() for i, j in chords])
    edges = np.concatenate([edges_ring,
                            np.asarray(chords, np.int32)])
    meas = np.concatenate([noisy_ring, meas_chords]).astype(np.float32)
    init = chain_initial_poses(8, edges, meas)
    res = optimize_pose_graph(init, edges, meas, iterations=10)
    assert (float(np.square(res.residual_after).sum())
            < float(np.square(res.residual_before).sum()))
    dt_init, _ = _pose_err(np.asarray(init), gt)
    dt_opt, _ = _pose_err(np.asarray(res.poses), gt)
    assert dt_opt < dt_init
