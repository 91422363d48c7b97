"""Child process for test_multihost: one capture host in a 2-host DCN rig.

Each "host" ingests its own cameras, voxel-downsamples locally, and only the
fused, downsampled cloud crosses DCN (SURVEY.md §2.5 host<->host tier) —
here via a real jax.distributed process_allgather between two localhost
processes (Gloo over TCP, the CPU stand-in for DCN).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
from pointcloud_stitching_tpu.utils.platform import apply_platform_override

apply_platform_override()


def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]
    from pointcloud_stitching_tpu.parallel import init_multihost

    assert init_multihost(coordinator=f"127.0.0.1:{port}",
                          num_processes=2, process_id=pid)
    import jax
    import numpy as np

    assert jax.process_count() == 2
    # global devices = both hosts' local devices (local count depends on
    # whether the caller forced a virtual multi-device CPU platform)
    assert len(jax.devices()) == 2 * len(jax.local_devices())

    # local half of the rig: this host's cameras -> local voxel downsample
    from pointcloud_stitching_tpu import PointCloud
    from pointcloud_stitching_tpu.ops import voxel_downsample

    rng = np.random.default_rng(pid)
    xyz = rng.uniform(pid, pid + 1, (4096, 3)).astype(np.float32)
    local = voxel_downsample(PointCloud.from_points(xyz, capacity=4096),
                             0.25, capacity=1024)

    # only the downsampled cloud crosses DCN
    from jax.experimental import multihost_utils

    fused_xyz = multihost_utils.process_allgather(np.asarray(local.xyz))
    fused_mask = multihost_utils.process_allgather(np.asarray(local.mask))
    assert fused_xyz.shape == (2, 1024, 3)
    pts = fused_xyz[fused_mask]
    # both hosts' disjoint unit cubes must be present in the fused cloud
    assert (pts.min(0) < 0.5).all() and (pts.max(0) > 1.5).all(), pts
    print(f"MULTIHOST_OK {pid} fused={int(fused_mask.sum())}", flush=True)


if __name__ == "__main__":
    main()
