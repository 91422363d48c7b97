"""End-to-end parity on a recorded stream: device pipeline vs numpy oracle.

BASELINE.json: "stitched-cloud outputs must match the PCL reference
bit-for-bit up to float tolerance on recorded streams." The oracle here IS
the PCL-equivalent math (tests/oracle.py), run over the same recorded
synthetic stream the fake server replays.
"""
import numpy as np
import jax.numpy as jnp

from pointcloud_stitching_tpu import Intrinsics
from pointcloud_stitching_tpu.models import stitch_step
from pointcloud_stitching_tpu.runtime import synthetic_frames
from pointcloud_stitching_tpu.utils.config import StitchConfig
from oracle import deproject_np, random_se3, transform_np, voxel_downsample_np


def _oracle_stitch(depths, intrs, exts, leaf, z_min, z_max):
    """Full numpy pipeline: deproject -> transform -> concat -> voxel."""
    clouds = []
    for d, (fx, fy, ppx, ppy), T in zip(depths, intrs, exts):
        xyz, mask = deproject_np(d, fx, fy, ppx, ppy,
                                 z_min=z_min, z_max=z_max)
        clouds.append(transform_np(T, xyz[mask]))
    allpts = np.concatenate(clouds)
    out, _ = voxel_downsample_np(allpts, leaf)
    return out


def test_recorded_stream_parity():
    ncam, h, w = 3, 120, 212
    frames = [synthetic_frames(4, h, w, seed=s) for s in range(ncam)]
    intr_params = [(106.0, 106.0, w / 2, h / 2)] * ncam
    exts = np.stack([random_se3(seed=40 + i, max_angle=0.2, max_trans=0.3)
                     for i in range(ncam)])

    cfg = StitchConfig(num_cameras=ncam, height=h, width=w,
                       z_min=0.1, z_max=10.0,
                       out_voxel_leaf=0.03, out_capacity=65536,
                       icp_enabled=False)
    i0 = Intrinsics.create(*intr_params[0], width=w, height=h)
    intr = i0.stack([Intrinsics.create(*p, width=w, height=h)
                     for p in intr_params[1:]])

    for t in range(4):  # every frame of the recorded stream
        depths = np.stack([f[t] for f in frames])
        out = stitch_step(cfg, intr, jnp.asarray(exts), jnp.asarray(depths))
        got = np.asarray(out.cloud.xyz)[np.asarray(out.cloud.mask)]
        want = _oracle_stitch(depths, intr_params, exts,
                              cfg.out_voxel_leaf, cfg.z_min, cfg.z_max)
        assert got.shape == want.shape, (t, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=2e-4,
                                   err_msg=f"frame {t}")
