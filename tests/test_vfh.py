"""VFH global descriptor (pcl::VFHEstimation role)."""
import math

import jax.numpy as jnp
import numpy as np

from pointcloud_stitching_tpu import PointCloud
from pointcloud_stitching_tpu.ops.vfh import (VFH_ANGLE_BINS, VFH_DIM,
                                              VFH_VP_BINS, vfh)
from oracle import random_se3, transform_np
from test_fpfh import _pair_feature_np, _bumpy_surface, _sphere_plane


def _pc(xyz, mask=None):
    xyz = np.asarray(xyz, np.float32)
    m = np.ones(len(xyz), bool) if mask is None else np.asarray(mask)
    return PointCloud(xyz=jnp.asarray(xyz), mask=jnp.asarray(m))


def vfh_np(xyz, normals, valid, viewpoint=(0.0, 0.0, 0.0)):
    """Independent oracle of the module contract."""
    w = valid.astype(float)
    tot = w.sum()
    c = (xyz * w[:, None]).sum(0) / max(tot, 1.0)
    nc = (normals * w[:, None]).sum(0)
    nc /= max(np.linalg.norm(nc), 1e-12)
    d = np.linalg.norm(xyz - c, axis=1)
    dmax = max(d[valid].max() if valid.any() else 0.0, 1e-12)
    vp = np.asarray(viewpoint) - c
    vp /= max(np.linalg.norm(vp), 1e-12)

    def hist(vals, lo, hi, ws, bins):
        h = np.zeros(bins)
        for v, wi in zip(vals, ws):
            if wi > 0:
                b = min(max(int(math.floor((v - lo) * bins / (hi - lo))), 0),
                        bins - 1)
                h[b] += wi
        s = h.sum()
        return 100.0 * h / s if s > 0 else h

    al, ph, th, wgt = [], [], [], []
    for i in range(len(xyz)):
        if not valid[i] or d[i] <= 1e-6:
            al.append(0); ph.append(0); th.append(0); wgt.append(0.0)
            continue
        pf = _pair_feature_np(c, nc, xyz[i], normals[i])
        if pf is None:
            al.append(0); ph.append(0); th.append(0); wgt.append(0.0)
            continue
        a, p, t = pf
        al.append(a); ph.append(p); th.append(t); wgt.append(1.0)
    wgt = np.asarray(wgt)
    cos_vp = (normals * vp).sum(1)
    return np.concatenate([
        hist(al, -1, 1, wgt, VFH_ANGLE_BINS),
        hist(ph, -1, 1, wgt, VFH_ANGLE_BINS),
        hist(th, -np.pi, np.pi, wgt, VFH_ANGLE_BINS),
        hist(d / dmax, 0, 1, wgt, VFH_ANGLE_BINS),
        hist(cos_vp, -1, 1, w, VFH_VP_BINS),
    ])


def test_matches_numpy_oracle():
    xyz, nrm = _bumpy_surface(seed=7, n=250)
    valid = np.ones(250, bool)
    valid[::9] = False
    got, ok = vfh(_pc(xyz, valid), jnp.asarray(nrm),
                  jnp.asarray(valid), viewpoint=(0.1, -0.2, 2.0))
    want = vfh_np(xyz, nrm, valid, viewpoint=(0.1, -0.2, 2.0))
    assert bool(ok) and got.shape == (VFH_DIM,)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-3)


def test_pose_invariance_with_transformed_viewpoint():
    xyz, nrm = _bumpy_surface(seed=8, n=300)
    T = np.asarray(random_se3(seed=3, max_angle=2.0, max_trans=0.5))
    xyz2 = transform_np(T, xyz).astype(np.float32)
    nrm2 = (nrm @ T[:3, :3].T).astype(np.float32)
    vp = np.array([0.0, 0.0, 3.0])
    vp2 = T[:3, :3] @ vp + T[:3, 3]
    d1, _ = vfh(_pc(xyz), jnp.asarray(nrm), viewpoint=tuple(vp))
    d2, _ = vfh(_pc(xyz2), jnp.asarray(nrm2), viewpoint=tuple(vp2))
    assert float(jnp.abs(d1 - d2).sum()) < 1.0   # of a 500-sum descriptor


def test_distinguishes_object_classes():
    """Sphere patch vs plane patch: far-apart descriptors; two samplings
    of the same class: nearby descriptors."""
    xyz, nrm = _sphere_plane(seed=9)
    sph1, nsp1 = xyz[:70], nrm[:70]
    sph2, nsp2 = xyz[70:140], nrm[70:140]
    pla, npl = xyz[140:], nrm[140:]
    ds1, _ = vfh(_pc(sph1), jnp.asarray(nsp1))
    ds2, _ = vfh(_pc(sph2), jnp.asarray(nsp2))
    dpl, _ = vfh(_pc(pla), jnp.asarray(npl))
    same = float(jnp.linalg.norm(ds1 - ds2))
    diff = float(jnp.linalg.norm(ds1 - dpl))
    assert diff > 2.0 * same, (same, diff)


def test_per_cluster_workflow_and_degenerate():
    from pointcloud_stitching_tpu.ops import euclidean_clusters
    a = np.random.default_rng(1).uniform(-0.1, 0.1, (80, 3)) + [0, 0, 1]
    b = np.random.default_rng(2).uniform(-0.1, 0.1, (60, 3)) + [3, 0, 1]
    xyz = np.concatenate([a, b]).astype(np.float32)
    nrm = np.tile([0.0, 0.0, 1.0], (140, 1)).astype(np.float32)
    pc = _pc(xyz)
    labels, num, _ = euclidean_clusters(pc, 0.3, max_clusters=4)
    assert int(num) == 2
    descs = []
    for k in range(2):
        m = pc.mask & (labels == k)
        dk, okk = vfh(pc.replace(mask=m), jnp.asarray(nrm))
        assert bool(okk)
        descs.append(np.asarray(dk))
    sums = descs[0].reshape(-1)[:180].reshape(4, 45).sum(1)
    np.testing.assert_allclose(sums, 100.0, atol=1e-3)
    # a single point (or none) is not a describable object
    one = PointCloud(xyz=pc.xyz, mask=jnp.arange(140) == 0)
    _, ok1 = vfh(one, jnp.asarray(nrm))
    assert not bool(ok1)
