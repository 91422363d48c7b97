"""Registration CLI, rendering sink, record+replay."""
import os
import subprocess
import sys
import time

import numpy as np

from pointcloud_stitching_tpu.io import load_cal, load_ply, save_ply
from pointcloud_stitching_tpu.io.render import render_orthographic, save_image
from pointcloud_stitching_tpu.runtime import (FakeCameraServer,
                                              MulticameraClient,
                                              synthetic_frames)
from oracle import random_se3, transform_np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_register_cli_end_to_end(tmp_path, rng):
    pts = rng.uniform(-1, 1, (2000, 3)).astype(np.float32)
    T_true = random_se3(seed=5, max_angle=0.4, max_trans=0.4)
    src_p, dst_p = tmp_path / "src.ply", tmp_path / "dst.ply"
    save_ply(str(src_p), pts)
    save_ply(str(dst_p), transform_np(T_true, pts))
    picks = tmp_path / "picks.txt"
    picks.write_text("\n".join(f"{i} {i}" for i in [5, 300, 999, 1500]))
    out = tmp_path / "pair.cal"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "registration/register_cli.py"),
         str(src_p), str(dst_p), str(out), "--picks", str(picks),
         "--max-corr-dist", "1.0"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    T = load_cal(str(out))
    np.testing.assert_allclose(T, T_true, atol=1e-3)


def test_render_orthographic_shapes(rng):
    xyz = rng.normal(size=(5000, 3)).astype(np.float32)
    img = render_orthographic(xyz, size=256)
    assert img.shape == (256, 256, 3) and img.dtype == np.uint8
    assert (img != 0).any()
    # with rgb
    rgb = rng.integers(0, 255, (5000, 3))
    img2 = render_orthographic(xyz, rgb, axis="x", size=128)
    assert img2.shape == (128, 128, 3)


def test_render_empty_cloud():
    img = render_orthographic(np.zeros((0, 3), np.float32), size=64)
    assert (img == 0).all()


def test_save_image(tmp_path, rng):
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    p = str(tmp_path / "x.png")
    save_image(p, img)
    files = os.listdir(tmp_path)
    assert files and files[0].startswith("x.")


def test_record_and_replay(tmp_path):
    """Client records incoming frames; the recording replays byte-identically
    through a new fake server (SURVEY.md §5 record+replay)."""
    from pointcloud_stitching_tpu import Intrinsics
    from pointcloud_stitching_tpu.models import StitchingPipeline
    from pointcloud_stitching_tpu.utils.config import StitchConfig

    h, w = 60, 106
    frames = synthetic_frames(4, h, w, seed=3)
    srv = FakeCameraServer(frames).start()
    try:
        cfg = StitchConfig(num_cameras=1, height=h, width=w,
                           out_voxel_leaf=0.05, out_capacity=4096,
                           icp_enabled=False)
        i0 = Intrinsics.create(fx=53.0, fy=53.0, ppx=w / 2, ppy=h / 2,
                               width=w, height=h)
        pipe = StitchingPipeline(cfg, i0.stack([]), np.eye(4)[None])
        client = MulticameraClient([("127.0.0.1", srv.port)], pipe,
                                   record_frames=4).start()
        assert client.wait_for_first_frames(10)
        deadline = time.time() + 10
        while len(client._threads[0].recorded) < 4 and time.time() < deadline:
            time.sleep(0.05)
        client.stop()
        paths = client.save_recording(str(tmp_path))
        assert len(paths) == 1
        rec = np.load(paths[0])
        assert rec.shape == (4, h, w)
        np.testing.assert_array_equal(rec, frames)
    finally:
        srv.stop()
