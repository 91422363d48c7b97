"""FPFH descriptors: numpy-oracle parity, matching, invariances."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_stitching_tpu import PointCloud
from pointcloud_stitching_tpu.ops.fpfh import FPFH_BINS, fpfh, match_fpfh


# ---------------------------------------------------------------- oracle

def _pair_feature_np(p1, n1, p2, n2):
    dp = p2 - p1
    d = np.linalg.norm(dp)
    a1 = float(n1 @ dp) / d
    a2 = float(n2 @ dp) / d
    if abs(a1) < abs(a2):
        ns, nt, dvec, phi = n2, n1, -dp, -a2
    else:
        ns, nt, dvec, phi = n1, n2, dp, a1
    v = np.cross(dvec, ns)
    vn = np.linalg.norm(v)
    if vn <= 1e-5 * d:
        return None
    v = v / vn
    w = np.cross(ns, v)
    alpha = float(v @ nt)
    theta = math.atan2(float(w @ nt), float(ns @ nt))
    return alpha, phi, theta


def _bin(x, lo, hi):
    b = int(np.floor((x - lo) * (FPFH_BINS / (hi - lo))))
    return min(max(b, 0), FPFH_BINS - 1)


def fpfh_np(xyz, normals, valid, radius, min_neighbors=3):
    """Direct per-pair loop implementation of the module contract."""
    n = len(xyz)
    spfh = np.zeros((n, 3 * FPFH_BINS))
    k = np.zeros(n)
    kn = np.zeros(n)
    r2 = radius * radius
    for i in range(n):
        if not valid[i]:
            continue
        for j in range(n):
            if i == j or not valid[j]:
                continue
            d2 = float(np.sum((xyz[j] - xyz[i]) ** 2))
            if d2 > r2 or d2 <= 1e-12:
                continue
            kn[i] += 1
            pf = _pair_feature_np(xyz[i], normals[i], xyz[j], normals[j])
            if pf is None:
                continue
            a, p, t = pf
            spfh[i, _bin(a, -1, 1)] += 1
            spfh[i, FPFH_BINS + _bin(p, -1, 1)] += 1
            spfh[i, 2 * FPFH_BINS + _bin(t, -np.pi, np.pi)] += 1
            k[i] += 1
    snorm = spfh / np.maximum(k, 1)[:, None]
    desc = snorm.copy()
    for i in range(n):
        if not valid[i]:
            continue
        acc = np.zeros(3 * FPFH_BINS)
        for j in range(n):
            if i == j or not valid[j]:
                continue
            d2 = float(np.sum((xyz[j] - xyz[i]) ** 2))
            if d2 > r2 or d2 <= 1e-12:
                continue
            acc += snorm[j] / max(d2, 1e-12)
        desc[i] = snorm[i] + acc / max(kn[i], 1)
    ok = valid & (k >= min_neighbors)
    d3 = desc.reshape(-1, 3, FPFH_BINS)
    s = d3.sum(-1, keepdims=True)
    d3 = np.where(s > 0, 100.0 * d3 / np.maximum(s, 1e-12), 0.0)
    return np.where(ok[:, None], d3.reshape(-1, 3 * FPFH_BINS), 0.0), ok


# ----------------------------------------------------------------- scenes

def _sphere_plane(seed=0, n_sphere=140, n_plane=120):
    """Points with analytically known normals: a unit sphere patch (radial)
    plus a tilted plane (constant normal)."""
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(n_sphere, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    sph = 0.5 * u + np.array([0.0, 0.0, 1.5])
    nrm_s = u
    pn = np.array([0.2, 0.3, 0.93])
    pn /= np.linalg.norm(pn)
    b1 = np.cross(pn, [1.0, 0.0, 0.0])
    b1 /= np.linalg.norm(b1)
    b2 = np.cross(pn, b1)
    ab = rng.uniform(-0.6, 0.6, (n_plane, 2))
    pl = ab[:, :1] * b1 + ab[:, 1:] * b2 + np.array([1.2, -0.4, 1.0])
    nrm_p = np.tile(pn, (n_plane, 1))
    xyz = np.concatenate([sph, pl]).astype(np.float32)
    nrm = np.concatenate([nrm_s, nrm_p]).astype(np.float32)
    return xyz, nrm


def test_matches_numpy_oracle():
    xyz, nrm = _sphere_plane(seed=1)
    valid = np.ones(len(xyz), bool)
    valid[::13] = False            # exercise masking
    d_np, ok_np = fpfh_np(xyz, nrm, valid, radius=0.3)
    d_j, ok_j = fpfh(PointCloud(xyz=jnp.asarray(xyz),
                                mask=jnp.asarray(valid)),
                     jnp.asarray(nrm), radius=0.3,
                     query_tile=64, ref_tile=96)   # force multi-block sweep
    assert np.array_equal(np.asarray(ok_j), ok_np)
    np.testing.assert_allclose(np.asarray(d_j), d_np, atol=5e-3)


def test_descriptor_blocks_sum_to_100():
    xyz, nrm = _sphere_plane(seed=2)
    d, ok = fpfh(PointCloud(xyz=jnp.asarray(xyz),
                            mask=jnp.ones(len(xyz), bool)),
                 jnp.asarray(nrm), radius=0.3)
    sums = np.asarray(d).reshape(-1, 3, FPFH_BINS).sum(-1)
    okn = np.asarray(ok)
    np.testing.assert_allclose(sums[okn], 100.0, atol=1e-3)
    assert (sums[~okn] == 0).all()


def _bumpy_surface(seed=0, n=300, n_bumps=12):
    """Random Gaussian-bump height field with analytic normals. Unlike the
    sphere/plane scene this one is HETEROGENEOUS — every point's local
    curvature differs — so descriptors are point-distinctive, which is what
    the matching tests need (on a homogeneous surface all descriptors are
    equal by construction and self-matching is a coin flip)."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-1, 1, (n, 2))
    c = rng.uniform(-1, 1, (n_bumps, 2))
    a = rng.uniform(-0.25, 0.25, n_bumps)
    s = rng.uniform(0.08, 0.3, n_bumps)
    z, gx, gy = np.zeros(n), np.zeros(n), np.zeros(n)
    for k in range(n_bumps):
        dx, dy = xy[:, 0] - c[k, 0], xy[:, 1] - c[k, 1]
        e = a[k] * np.exp(-(dx ** 2 + dy ** 2) / (2 * s[k] ** 2))
        z += e
        gx += e * (-dx / s[k] ** 2)
        gy += e * (-dy / s[k] ** 2)
    xyz = np.stack([xy[:, 0], xy[:, 1], z], 1).astype(np.float32)
    nrm = np.stack([-gx, -gy, np.ones(n)], 1)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return xyz, nrm.astype(np.float32)


def test_rigid_invariance_via_self_matching():
    """Descriptors are pose-invariant up to bin-edge jitter: after a rigid
    motion each descriptor stays numerically put (measured ~2e-5 L1 on this
    scene), and most points' nearest descriptor in the original cloud is
    themselves."""
    from oracle import random_se3, transform_np
    xyz, nrm = _bumpy_surface(seed=3)
    T = random_se3(seed=4, max_angle=2.0, max_trans=0.5)
    xyz2 = transform_np(T, xyz).astype(np.float32)
    nrm2 = (nrm @ np.asarray(T)[:3, :3].T).astype(np.float32)
    mask = jnp.ones(len(xyz), bool)
    d1, ok1 = fpfh(PointCloud(xyz=jnp.asarray(xyz), mask=mask),
                   jnp.asarray(nrm), radius=0.3)
    d2, ok2 = fpfh(PointCloud(xyz=jnp.asarray(xyz2), mask=mask),
                   jnp.asarray(nrm2), radius=0.3)
    l1 = np.abs(np.asarray(d1) - np.asarray(d2)).sum(1)
    assert np.median(l1) < 1.0, np.median(l1)   # of a 300-sum descriptor
    idx, _ = match_fpfh(d2, ok2, d1, ok1, k=1)
    hit = (np.asarray(idx)[:, 0] == np.arange(len(xyz))) & np.asarray(ok2)
    assert hit.sum() >= 0.85 * np.asarray(ok2).sum(), hit.sum()


def test_match_fpfh_against_argsort():
    rng = np.random.default_rng(5)
    a = rng.uniform(0, 10, (37, 33)).astype(np.float32)
    b = rng.uniform(0, 10, (53, 33)).astype(np.float32)
    ok_a = np.ones(37, bool)
    ok_b = rng.uniform(size=53) > 0.2
    idx, d2 = match_fpfh(jnp.asarray(a), jnp.asarray(ok_a),
                         jnp.asarray(b), jnp.asarray(ok_b), k=3,
                         query_tile=16, ref_tile=16)
    full = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    full[:, ~ok_b] = np.inf
    want = np.argsort(full, axis=1)[:, :3]
    assert np.array_equal(np.asarray(idx), want)
    np.testing.assert_allclose(np.asarray(d2),
                               np.take_along_axis(full, want, 1),
                               rtol=1e-4, atol=1e-4)


def test_isolated_points_are_invalid():
    xyz = np.array([[0, 0, 0], [0.01, 0, 0], [0.0, 0.01, 0],
                    [0.01, 0.01, 0], [5, 5, 5]], np.float32)
    nrm = np.tile([0.0, 0.0, 1.0], (5, 1)).astype(np.float32)
    _, ok = fpfh(PointCloud(xyz=jnp.asarray(xyz), mask=jnp.ones(5, bool)),
                 jnp.asarray(nrm), radius=0.05, min_neighbors=3)
    assert np.asarray(ok).tolist() == [True, True, True, True, False]


def test_separates_surface_classes():
    """Plane points must look like each other and unlike sphere points."""
    xyz, nrm = _sphere_plane(seed=6)
    d, ok = fpfh(PointCloud(xyz=jnp.asarray(xyz),
                            mask=jnp.ones(len(xyz), bool)),
                 jnp.asarray(nrm), radius=0.3)
    d = np.asarray(d)
    okn = np.asarray(ok)
    sph = d[:140][okn[:140]]
    pla = d[140:][okn[140:]]
    intra = np.linalg.norm(pla - pla.mean(0), axis=1).mean()
    inter = np.linalg.norm(sph - pla.mean(0), axis=1).mean()
    assert inter > 2.0 * intra, (intra, inter)
