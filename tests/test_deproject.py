import numpy as np
import jax.numpy as jnp

from pointcloud_stitching_tpu import Intrinsics, DistortionModel
from pointcloud_stitching_tpu.ops import deproject, deproject_with_color
from oracle import deproject_np, synth_depth_frame


INTR = dict(fx=421.5, fy=421.1, ppx=423.2, ppy=238.9)


def test_deproject_matches_oracle():
    depth = synth_depth_frame(seed=3)
    intr = Intrinsics.create(**INTR)
    pc = deproject(depth, intr)
    xyz_ref, mask_ref = deproject_np(depth, **INTR)
    np.testing.assert_array_equal(np.asarray(pc.mask), mask_ref)
    np.testing.assert_allclose(np.asarray(pc.xyz), xyz_ref, atol=1e-5)


def test_deproject_zero_depth_masked():
    depth = np.zeros((480, 848), np.uint16)
    depth[5, 7] = 1000
    pc = deproject(depth, Intrinsics.create(**INTR))
    assert int(pc.count()) == 1
    assert np.asarray(pc.mask)[5 * 848 + 7]


def test_deproject_z_range():
    depth = synth_depth_frame(seed=4)
    pc = deproject(depth, Intrinsics.create(**INTR), z_min=0.5, z_max=2.0)
    xyz = np.asarray(pc.xyz)
    m = np.asarray(pc.mask)
    assert (xyz[m, 2] > 0.5).all() and (xyz[m, 2] <= 2.0).all()


def test_deproject_brown_conrady():
    depth = synth_depth_frame(seed=5)
    coeffs = [0.1, -0.05, 0.001, -0.002, 0.01]
    intr = Intrinsics.create(**INTR, coeffs=coeffs,
                             model=DistortionModel.BROWN_CONRADY)
    pc = deproject(depth, intr)
    xyz_ref, mask_ref = deproject_np(depth, **INTR, coeffs=coeffs,
                                     model="brown_conrady")
    np.testing.assert_allclose(np.asarray(pc.xyz), xyz_ref, atol=1e-4)


def test_deproject_inverse_brown_conrady():
    depth = synth_depth_frame(seed=6)
    coeffs = [0.12, -0.04, 0.002, -0.001, 0.005]
    intr = Intrinsics.create(**INTR, coeffs=coeffs,
                             model=DistortionModel.INVERSE_BROWN_CONRADY)
    pc = deproject(depth, intr)
    xyz_ref, _ = deproject_np(depth, **INTR, coeffs=coeffs,
                              model="inverse_brown_conrady")
    np.testing.assert_allclose(np.asarray(pc.xyz), xyz_ref, atol=1e-4)


def test_deproject_batched_cameras():
    depths = np.stack([synth_depth_frame(seed=s) for s in range(3)])
    base = Intrinsics.create(**INTR)
    others = [Intrinsics.create(fx=400.0, fy=401.0, ppx=424.0, ppy=240.0),
              Intrinsics.create(fx=430.0, fy=429.0, ppx=420.0, ppy=241.0)]
    batched = base.stack(others)
    pc = deproject(depths, batched)
    assert pc.xyz.shape == (3, 480 * 848, 3)
    # camera 1 must match its own single-camera result
    pc1 = deproject(depths[1], others[0])
    np.testing.assert_allclose(np.asarray(pc.xyz[1]), np.asarray(pc1.xyz),
                               atol=1e-6)


def test_deproject_with_color():
    depth = synth_depth_frame(seed=7)
    color = (np.arange(480 * 848 * 3) % 255).reshape(480, 848, 3).astype(np.uint8)
    pc = deproject_with_color(depth, color, Intrinsics.create(**INTR))
    m = np.asarray(pc.mask)
    np.testing.assert_allclose(
        np.asarray(pc.rgb)[m], color.reshape(-1, 3)[m].astype(np.float32))
