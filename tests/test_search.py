"""knn_search / radius_search vs a dense numpy oracle.

The pcl::KdTreeFLANN contract: squared distances, ascending order,
radiusSearch capped at max_nn; fixed shapes encode absent neighbors as
index -1 / distance +inf.
"""
import numpy as np
import pytest

from pointcloud_stitching_tpu import PointCloud
from pointcloud_stitching_tpu.ops import knn_search, radius_search


def _clouds(nq=300, nr=700, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(nq, 3)).astype(np.float32)
    r = rng.normal(size=(nr, 3)).astype(np.float32)
    return q, r


def _oracle_knn(q, r, rmask, k):
    d2 = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    d2[:, ~rmask] = np.inf
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d2, idx, axis=1), idx


def test_knn_matches_oracle():
    q, r = _clouds()
    k = 7
    d2, idx = knn_search(PointCloud.from_points(q),
                         PointCloud.from_points(r), k)
    od2, oidx = _oracle_knn(q, r, np.ones(len(r), bool), k)
    np.testing.assert_allclose(np.asarray(d2), od2, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    # ascending order, PCL-style
    assert (np.diff(np.asarray(d2), axis=1) >= 0).all()


def test_knn_masked_refs_and_queries():
    q, r = _clouds(seed=1)
    rmask = np.ones(len(r), bool)
    rmask[::3] = False
    qmask = np.ones(len(q), bool)
    qmask[5] = False
    qpc = PointCloud.from_points(q).replace(mask=np.asarray(qmask))
    rpc = PointCloud.from_points(r).replace(mask=np.asarray(rmask))
    d2, idx = knn_search(qpc, rpc, 4)
    d2, idx = np.asarray(d2), np.asarray(idx)
    od2, oidx = _oracle_knn(q, r, rmask, 4)
    live = qmask
    np.testing.assert_allclose(d2[live], od2[live], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(idx[live], oidx[live])
    assert (idx[~live] == -1).all() and np.isinf(d2[~live]).all()
    assert not np.isin(idx[live], np.nonzero(~rmask)[0]).any()


def test_knn_fewer_refs_than_k():
    q = np.zeros((4, 3), np.float32)
    r = np.array([[1, 0, 0], [2, 0, 0]], np.float32)
    d2, idx = knn_search(PointCloud.from_points(q),
                         PointCloud.from_points(r), 5)
    d2, idx = np.asarray(d2), np.asarray(idx)
    np.testing.assert_allclose(d2[:, :2], [[1.0, 4.0]] * 4)
    np.testing.assert_array_equal(idx[:, :2], [[0, 1]] * 4)
    assert (idx[:, 2:] == -1).all() and np.isinf(d2[:, 2:]).all()


def test_knn_exclude_self():
    pts = np.random.default_rng(2).normal(size=(200, 3)).astype(np.float32)
    pc = PointCloud.from_points(pts)
    d2, idx = knn_search(pc, pc, 3, exclude_self=True)
    d2, idx = np.asarray(d2), np.asarray(idx)
    assert (idx != np.arange(200)[:, None]).all()
    assert (d2 > 0).all()
    d2s, idxs = knn_search(pc, pc, 3)
    np.testing.assert_array_equal(np.asarray(idxs)[:, 0], np.arange(200))
    np.testing.assert_allclose(np.asarray(d2s)[:, 0], 0.0, atol=1e-10)


def test_radius_search_matches_oracle():
    q, r = _clouds(seed=3)
    radius, max_nn = 0.6, 16
    d2, idx, cnt = radius_search(PointCloud.from_points(q),
                                 PointCloud.from_points(r), radius, max_nn)
    d2, idx, cnt = map(np.asarray, (d2, idx, cnt))
    od2 = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    true_cnt = (od2 <= radius * radius).sum(axis=1)
    np.testing.assert_array_equal(cnt, np.minimum(true_cnt, max_nn))
    for i in range(len(q)):
        c = cnt[i]
        assert (idx[i, :c] >= 0).all() and (idx[i, c:] == -1).all()
        assert (d2[i, :c] <= radius * radius + 1e-6).all()
        assert np.isinf(d2[i, c:]).all()
        # the capped set is the c CLOSEST in-radius neighbors
        want = np.sort(od2[i][od2[i] <= radius * radius])[:c]
        np.testing.assert_allclose(d2[i, :c], want, rtol=1e-5, atol=1e-6)


def test_radius_is_traced_no_recompile():
    import jax
    q, r = _clouds(80, 120, seed=4)
    qpc, rpc = PointCloud.from_points(q), PointCloud.from_points(r)
    calls = []
    def f(rad):
        calls.append(1)
        return radius_search(qpc, rpc, rad, 8)[2]
    jf = jax.jit(f)
    c1 = np.asarray(jf(0.3))
    c2 = np.asarray(jf(0.9))
    assert len(calls) == 1  # one trace serves every radius
    assert c2.sum() >= c1.sum()


def test_radius_search_rejects_max_nn_zero():
    # PCL's max_nn=0 means "unlimited"; fixed shapes cannot express that,
    # so the deviation is an explicit error, not a silent [N,0] result.
    import pytest
    q, r = _clouds(8, 16, seed=5)
    with pytest.raises(ValueError, match="max_nn"):
        radius_search(PointCloud.from_points(q),
                      PointCloud.from_points(r), 0.5, 0)
