"""End-to-end TPU verify driver (the /verify skill's recipe, checked in).

Drives the public API on the real chip: TSDF integrate -> raycast ->
track -> extract against an analytic scene with known ground truth,
then a 4-camera loopback streaming run (fake servers -> TCP -> snappy
-> pipelined client) through the snapshot staging ring. Asserts
accuracy bounds and prints steady-state timings. ~3 min on a warm
compile cache; run from the repo root on a quiet host:

    python scripts/verify_tpu.py
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))
import numpy as np
import jax, jax.numpy as jnp

print("platform:", jax.devices()[0].platform, flush=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# --- warm the claim/tunnel before timing anything -------------------------
w = jax.jit(lambda x: x @ x)(jnp.ones((256, 256), jnp.float32))
for _ in range(50):
    w = jax.jit(lambda x: x @ x)(w * 0 + 1)
print("warm", float(jnp.sum(w)), flush=True)

from pointcloud_stitching_tpu import Intrinsics
from pointcloud_stitching_tpu.models import tsdf as M

# --- public TSDF path: integrate -> raycast -> track -> extract ----------
# analytic sphere+plane scene (the oracle's): smooth surfaces, known
# ground truth. The rough multi-octave synth frame is raycastable too
# but its strict 6-neighborhood normal validity keeps only ~7% of rays
# (verified identical old-vs-new on CPU, scratch/ab_valid_cpu.out) — not
# a useful verify signal.
from test_tsdf import render_depth
h, w_ = 240, 424
intr = Intrinsics.create(fx=210.0, fy=210.0, ppx=212.0, ppy=120.0,
                         width=w_, height=h)
T0 = jnp.eye(4, dtype=jnp.float32)
SCENE = dict(
    spheres=[((-0.4, 0.1, 1.4), 0.35), ((0.5, -0.2, 1.8), 0.3),
             ((0.0, 0.45, 1.1), 0.2)],
    planes=[((0.0, 0.0, -1.0), -2.4)],
)
depth_m = render_depth(intr, np.eye(4, dtype=np.float32), **SCENE)
depth = (depth_m * 1000.0).astype(np.uint16)
d0 = jnp.asarray(depth)

vol = M.TSDFVolume.create(shape=(192, 192, 192), leaf=0.015,
                          origin=(-1.44, -1.44, 0.2))
vol = M.integrate(vol, d0, intr, T0)  # 2-D branch batches intr itself
occ = int(jnp.sum(vol.weight > 0))
print("integrate: occupied", occ, flush=True)
assert occ > 10000

rc = M.raycast(vol, intr, T0)
nval = int(jnp.sum(rc.valid))
nrm = np.asarray(rc.normal)[np.asarray(rc.valid)]
nl = np.linalg.norm(nrm, axis=-1)
print(f"raycast: {nval} valid, |n| in [{nl.min():.4f}, {nl.max():.4f}]",
      flush=True)
assert nval > 30000 and abs(nl.min() - 1) < 1e-3 and abs(nl.max() - 1) < 1e-3

# depth parity: raycast depth at valid pixels must match the analytic
# scene to sub-voxel accuracy (trilinear secant refinement)
sel = np.asarray(rc.valid) & (np.asarray(depth) > 0)
dz = np.abs(np.asarray(rc.depth) - depth_m)[sel]
print(f"raycast depth vs analytic: median {np.median(dz)*1000:.3f} mm, "
      f"p99 {np.percentile(dz, 99)*1000:.3f} mm", flush=True)
assert np.median(dz) < 0.004

# track: perturb the pose, must recover
ang = np.deg2rad(1.2)
dT = np.eye(4, dtype=np.float32)
dT[:3, :3] = [[np.cos(ang), -np.sin(ang), 0],
              [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
dT[:3, 3] = [0.008, -0.006, 0.005]
res = M.track(vol, d0, intr, jnp.asarray(dT) @ T0, prior_window=0.3)
Re = np.asarray(res.T[:3, :3])
ang_err = np.rad2deg(np.arccos(np.clip((np.trace(Re) - 1) / 2, -1, 1)))
t_err = float(np.linalg.norm(np.asarray(res.T[:3, 3])))
print(f"track: {ang_err:.4f} deg / {t_err*1000:.3f} mm, "
      f"matched {int(res.n_matched)}", flush=True)
assert ang_err < 0.1 and t_err < 2e-3

# rig_track: the volume as an ONLINE extrinsics source (stitch_cli
# --tsdf-track). Inject a global rig drift (the mount-slip mode ring ICP
# cannot observe), track the anchor camera frame-to-model, and check the
# gated world correction both recovers the anchor and lifts rigidly to a
# second camera.
angg = np.deg2rad(1.0)
D = np.eye(4, dtype=np.float32)
D[:3, :3] = [[np.cos(angg), 0, np.sin(angg)],
             [0, 1, 0], [-np.sin(angg), 0, np.cos(angg)]]
D[:3, 3] = [0.02, -0.01, 0.015]
d_drift = jnp.asarray(
    (render_depth(intr, D, **SCENE) * 1000.0).astype(np.uint16))
T_cal1 = np.eye(4, dtype=np.float32)
T_cal1[:3, 3] = [0.05, 0.0, -0.02]
rt = M.rig_track(vol, jnp.stack([d_drift, d_drift]), intr.stack([intr]),
                 jnp.asarray(np.stack([np.eye(4, dtype=np.float32),
                                       T_cal1])), prior_window=0.3)
assert rt.applied
T0r = np.asarray(rt.extrinsics[0])
rt_terr = float(np.linalg.norm(T0r[:3, 3] - D[:3, 3]))
rt_aerr = np.rad2deg(np.arccos(np.clip(
    (np.trace(T0r[:3, :3].T @ D[:3, :3]) - 1) / 2, -1, 1)))
print(f"rig_track: drift 25.5 mm/1.0 deg -> residual "
      f"{rt_terr*1000:.3f} mm / {rt_aerr:.4f} deg", flush=True)
assert rt_terr < 4e-3 and rt_aerr < 0.15
np.testing.assert_allclose(np.asarray(rt.extrinsics[1]),
                           np.asarray(rt.G) @ T_cal1, atol=1e-5)
print("rig_track: rigid lift to camera 1 OK", flush=True)

cloud = M.extract_cloud(vol, capacity=262144)
print("extract_cloud:", int(jnp.sum(cloud.mask)), "points", flush=True)

# `vol` above came from method='auto' — the pruned mxu_pallas path on
# TPU (kernels/patch_gather.py on the real Mosaic path). Re-integrate
# with the dense gather oracle: bitwise-equal by construction.
vdn = M.TSDFVolume.create(shape=(192, 192, 192), leaf=0.015,
                          origin=(-1.44, -1.44, 0.2))
vdn = M.integrate(vdn, d0, intr, T0, method="dense")
assert np.array_equal(np.asarray(vdn.tsdf), np.asarray(vol.tsdf))
assert np.array_equal(np.asarray(vdn.weight), np.asarray(vol.weight))
print("integrate[auto=mxu_pallas]: bitwise == dense", flush=True)

# mesh extraction (ops/surface.py composed-table kernel): triangles on
# the analytic surface
verts, valid, n_act = M.extract_mesh(vol, cell_capacity=131072)
ntri = int(jnp.sum(valid))
v0s = np.asarray(verts)[:, :, np.asarray(valid)]   # [3 corners, 3 coords, T]
ctr = v0s.mean(axis=0).T                           # triangle centroids [T, 3]
sph = np.array(SCENE["spheres"][0][0], np.float32)
r_err = np.abs(np.linalg.norm(ctr - sph, axis=1) - SCENE["spheres"][0][1])
near0 = r_err < 0.02
print(f"extract_mesh: {ntri} tris ({int(n_act)} active cells); "
      f"{int(near0.sum())} centroids within 2 cm of sphere-0 radius",
      flush=True)
assert ntri > 20000 and int(near0.sum()) > 1000

# steady-state timings (sync by pulling a scalar through the tunnel)
def timeit(fn, n=5):
    r = fn()
    _ = float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        r = fn()
    _ = float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    return (time.time() - t0) / n * 1000

t_rcf = timeit(lambda: M.raycast(vol, intr, T0, stride=2))
t_rcp = timeit(lambda: M.raycast(vol, intr, T0, stride=2, prior_depth=d0))
t_tk = timeit(lambda: M.track(vol, d0, intr, T0, prior_window=0.3), n=3)
print(f"steady 424x240@192^3: raycast full {t_rcf:.1f} ms, "
      f"raycast(prior) {t_rcp:.1f} ms, track {t_tk:.1f} ms", flush=True)

# --- streaming loopback: fake servers + pipelined client ------------------
from pointcloud_stitching_tpu.models import StitchingPipeline
from pointcloud_stitching_tpu.runtime import (FakeCameraServer,
                                              MulticameraClient,
                                              synthetic_frames)
from pointcloud_stitching_tpu.utils.config import StitchConfig

ncam, fh, fw = 4, 240, 424
servers = [FakeCameraServer(synthetic_frames(8, fh, fw, seed=s)).start()
           for s in range(ncam)]
cfg = StitchConfig(num_cameras=ncam, height=fh, width=fw,
                   cam_voxel_leaf=0.01, cam_capacity=65536,
                   out_voxel_leaf=0.01, out_capacity=131072,
                   icp_enabled=False)
i0 = Intrinsics.create(fx=210.0, fy=210.0, ppx=fw / 2, ppy=fh / 2,
                       width=fw, height=fh)
ipipe = i0.stack([i0] * (ncam - 1))
ext = np.tile(np.eye(4, dtype=np.float32), (ncam, 1, 1))
for i in range(ncam):
    ext[i, 0, 3] = 0.05 * i
pipe = StitchingPipeline(cfg, ipipe, ext)
client = MulticameraClient([("127.0.0.1", s.port) for s in servers],
                           pipe).start()
try:
    # serial-mode spot check first (exercises the staging ring + late wake)
    client.wait_for_first_frames(timeout=10.0)
    out = None
    for _ in range(20):
        out = client.step()
        if out is not None:
            break
        time.sleep(0.1)
    nvox = int(jnp.sum(out.cloud.mask)) if out is not None else -1
    assert out is not None and nvox > 0
    print("serial stitch_frame:", nvox, "voxels", flush=True)

    frames = {"n": 0, "pts": 0}
    def on_frame(i, o):
        frames["n"] += 1
    t0 = time.time()
    client.run(num_frames=40, on_frame=on_frame, overlap=True)
    dt = time.time() - t0
    st = client.stages.summary()
    print(f"pipelined: {frames['n']} frames in {dt:.1f}s "
          f"({frames['n']/dt:.2f} FPS)", flush=True)
    print("stages:", {k: round(v * 1000, 2) for k, v in st.items()},
          flush=True)
    assert frames["n"] == 40

    # paced loop (--fps): 8 frames at 10 FPS must take >= 0.7 s wall
    # (floor is exact: 7 inter-tick gaps) and still deliver every frame
    t0 = time.time()
    m = client.run(num_frames=8, overlap=True, fps=10.0)
    dt_paced = time.time() - t0
    print(f"paced: 8 frames at fps=10 took {dt_paced:.2f}s", flush=True)
    assert dt_paced >= 0.7, dt_paced
finally:
    client.stop()
    for s in servers:
        s.stop()
print("ALL OK", flush=True)
