import numpy as np
import pytest

from pointcloud_stitching_tpu import PointCloud
from pointcloud_stitching_tpu.io import (discover_cals, load_cal, load_cals,
                                         load_ply, save_cal, save_cloud,
                                         save_ply)
from oracle import random_se3


def test_cal_roundtrip(tmp_path):
    T = random_se3(seed=1)
    p = tmp_path / "cam0.cal"
    save_cal(str(p), T)
    got = load_cal(str(p))
    np.testing.assert_allclose(got, T, atol=1e-7)


def test_cal_reference_format_compat(tmp_path):
    # plain whitespace 4x4 text, as the reference's registration tool writes
    p = tmp_path / "ref.cal"
    p.write_text("1 0 0 0.5\n0 1 0 -0.25\n0 0 1 2\n0 0 0 1\n")
    T = load_cal(str(p))
    assert T.shape == (4, 4) and T.dtype == np.float32
    assert T[0, 3] == 0.5 and T[1, 3] == -0.25


def test_discover_and_stack(tmp_path):
    for i in [2, 0, 1]:
        save_cal(str(tmp_path / f"cam{i}.cal"), random_se3(seed=i))
    paths = discover_cals(str(tmp_path))
    assert [p.split("/")[-1] for p in paths] == ["cam0.cal", "cam1.cal",
                                                "cam2.cal"]
    Ts = load_cals(paths)
    assert Ts.shape == (3, 4, 4)
    np.testing.assert_allclose(Ts[1], random_se3(seed=1), atol=1e-7)


def test_intrinsics_roundtrip_and_stack(tmp_path):
    """Per-camera .intr.json files: roundtrip, discovery order, and a mixed
    distortion-model rig stacking to MIXED."""
    from pointcloud_stitching_tpu import DistortionModel, Intrinsics
    from pointcloud_stitching_tpu.io import (discover_intrinsics,
                                             load_intrinsics,
                                             load_intrinsics_stack,
                                             save_intrinsics)

    a = Intrinsics.create(fx=421.5, fy=421.1, ppx=423.2, ppy=238.9,
                          width=848, height=480)
    b = Intrinsics.create(fx=420.0, fy=419.8, ppx=424.0, ppy=240.1,
                          coeffs=[0.1, -0.05, 0.001, -0.002, 0.01],
                          width=848, height=480,
                          model=DistortionModel.BROWN_CONRADY)
    save_intrinsics(str(tmp_path / "cam0.intr.json"), a)
    save_intrinsics(str(tmp_path / "cam1.intr.json"), b)
    paths = discover_intrinsics(str(tmp_path))
    assert [p.split("/")[-1] for p in paths] == ["cam0.intr.json",
                                                 "cam1.intr.json"]
    got = load_intrinsics(paths[1])
    assert float(got.fx) == 420.0 and got.model == 1
    np.testing.assert_allclose(np.asarray(got.coeffs),
                               [0.1, -0.05, 0.001, -0.002, 0.01])
    stack = load_intrinsics_stack(paths)
    assert stack.model == int(DistortionModel.MIXED)
    assert stack.fx.shape == (2,)


@pytest.mark.parametrize("binary", [True, False])
@pytest.mark.parametrize("with_rgb", [True, False])
def test_ply_roundtrip(tmp_path, rng, binary, with_rgb):
    xyz = rng.normal(size=(257, 3)).astype(np.float32)
    rgb = (rng.uniform(0, 255, (257, 3)).astype(np.uint8) if with_rgb
           else None)
    p = tmp_path / "c.ply"
    save_ply(str(p), xyz, rgb, binary=binary)
    got_xyz, got_rgb = load_ply(str(p))
    np.testing.assert_allclose(got_xyz, xyz, atol=1e-4 if not binary else 0)
    if with_rgb:
        np.testing.assert_array_equal(got_rgb, rgb)
    else:
        assert got_rgb is None


def test_save_cloud_writes_valid_prefix_only(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    pc = PointCloud.from_points(pts, capacity=128)
    p = tmp_path / "c.ply"
    save_cloud(str(p), pc)
    xyz, _ = load_ply(str(p))
    assert xyz.shape == (50, 3)
    np.testing.assert_allclose(xyz, pts)


@pytest.mark.parametrize("binary", [True, False])
@pytest.mark.parametrize("with_rgb", [True, False])
def test_pcd_roundtrip(tmp_path, rng, binary, with_rgb):
    from pointcloud_stitching_tpu.io import load_pcd, save_pcd
    xyz = rng.normal(size=(321, 3)).astype(np.float32)
    rgb = (rng.integers(0, 256, (321, 3)).astype(np.uint8) if with_rgb
           else None)
    p = tmp_path / "c.pcd"
    save_pcd(str(p), xyz, rgb, binary=binary)
    got_xyz, got_rgb = load_pcd(str(p))
    np.testing.assert_allclose(got_xyz, xyz, atol=0 if binary else 1e-4)
    if with_rgb:
        np.testing.assert_array_equal(got_rgb, rgb)
    else:
        assert got_rgb is None


def test_pcd_pcl_reference_file(tmp_path):
    """Hand-written PCD in PCL's own ascii style (separate header idioms)."""
    p = tmp_path / "ref.pcd"
    p.write_text(
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
        "COUNT 1 1 1\nWIDTH 2\nHEIGHT 1\n"
        "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS 2\nDATA ascii\n"
        "1.5 -2.0 0.25\n0 0 3\n")
    from pointcloud_stitching_tpu.io import load_pcd
    xyz, rgb = load_pcd(str(p))
    np.testing.assert_allclose(xyz, [[1.5, -2.0, 0.25], [0, 0, 3]])
    assert rgb is None
