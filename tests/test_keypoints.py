"""ISS keypoint detection (pcl::ISSKeypoint3D role)."""
import jax.numpy as jnp
import numpy as np

from pointcloud_stitching_tpu import PointCloud
from pointcloud_stitching_tpu.ops.keypoints import iss_keypoints


def _pc(xyz, mask=None):
    xyz = np.asarray(xyz, np.float32)
    m = np.ones(len(xyz), bool) if mask is None else mask
    return PointCloud(xyz=jnp.asarray(xyz), mask=jnp.asarray(m))


def iss_np(xyz, mask, sal_r, nms_r, g21, g32, min_nbrs):
    """Independent numpy oracle of the module contract."""
    n = len(xyz)
    d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    inside = (d2 <= sal_r ** 2) & mask[:, None] & mask[None, :]
    cnt = inside.sum(1).astype(float)
    w = 1.0 / np.maximum(cnt, 1.0)
    sal = np.zeros(n)
    eligible = np.zeros(n, bool)
    for i in range(n):
        if not mask[i]:
            continue
        nb = inside[i] & (d2[i] > 1e-12)
        if nb.sum() < min_nbrs:
            continue
        d = xyz[nb] - xyz[i]
        ww = w[nb]
        scat = (ww[:, None, None] * d[:, :, None] * d[:, None, :]).sum(0)
        scat /= max(ww.sum(), 1e-12)
        vals = np.maximum(np.linalg.eigvalsh(scat + 1e-12 * np.eye(3)), 0)
        l3, l2, l1 = vals
        if l2 < g21 * l1 and l3 < g32 * l2 and l3 > 0:
            eligible[i] = True
            sal[i] = l3
    kp = eligible.copy()
    for i in range(n):
        if not eligible[i]:
            continue
        nb = (d2[i] <= nms_r ** 2) & eligible
        if (sal[nb] > sal[i]).any():
            kp[i] = False
    return kp, sal


def _box_edges_scene(step=0.03, seed=0):
    """Three faces of a box meeting at a corner, plus jitter: faces are
    planar (fail gamma_21), the corner has full 3-D scatter."""
    rng = np.random.default_rng(seed)
    g = np.arange(step, 0.4, step, dtype=np.float32)
    u, v = np.meshgrid(g, g, indexing="ij")
    z = np.zeros_like(u)
    faces = [np.stack([u.ravel(), v.ravel(), z.ravel()], 1),
             np.stack([z.ravel(), u.ravel(), v.ravel()], 1),
             np.stack([v.ravel(), z.ravel(), u.ravel()], 1)]
    xyz = np.concatenate(faces + [np.zeros((1, 3), np.float32)])
    return (xyz + rng.normal(0, step / 30, xyz.shape)).astype(np.float32)


def test_matches_numpy_oracle():
    rng = np.random.default_rng(4)
    xyz = rng.uniform(0, 0.6, (220, 3)).astype(np.float32)
    mask = rng.uniform(size=220) > 0.1
    kp, sal = iss_keypoints(_pc(xyz, mask), 0.12, 0.1,
                            gamma_21=0.9, gamma_32=0.9, min_neighbors=5,
                            query_tile=64, ref_tile=64)
    kp_np, sal_np = iss_np(xyz, mask, 0.12, 0.1, 0.9, 0.9, 5)
    np.testing.assert_allclose(np.asarray(sal), sal_np, atol=1e-5)
    assert np.array_equal(np.asarray(kp), kp_np)


def test_flat_faces_are_never_keypoints():
    xyz = _box_edges_scene()
    kp, sal = iss_keypoints(_pc(xyz), 0.1, 0.08)
    kp = np.asarray(kp)
    # interior face points (far from all edges) must be rejected
    far = (np.abs(xyz) > 0.12).sum(1) >= 2
    interior = far & (np.abs(xyz).min(1) < 1e-3)
    assert interior.sum() > 50
    assert not kp[interior].any()
    # something near the corner must survive
    corner = np.linalg.norm(xyz, axis=1) < 0.15
    assert kp[corner].any()


def test_nms_thins_to_local_maxima():
    xyz = _box_edges_scene()
    pc = _pc(xyz)
    kp, sal = iss_keypoints(pc, 0.1, 0.15)
    kp_np = np.asarray(kp)
    pts = xyz[kp_np]
    if len(pts) > 1:
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        assert d.min() > 0.15, d.min()
    # tightening the suppression radius can only keep MORE-or-equal points
    kp2, _ = iss_keypoints(pc, 0.1, 0.05)
    assert int(jnp.sum(kp2)) >= int(jnp.sum(kp))


def test_all_masked_and_sparse():
    xyz = np.random.default_rng(0).uniform(0, 1, (32, 3)).astype(np.float32)
    kp, sal = iss_keypoints(_pc(xyz, np.zeros(32, bool)), 0.2)
    assert not np.asarray(kp).any() and float(jnp.sum(sal)) == 0.0
    # isolated points (fewer than min_neighbors) are never keypoints
    kp2, _ = iss_keypoints(_pc(xyz * 100.0), 0.2)
    assert not np.asarray(kp2).any()
