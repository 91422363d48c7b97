"""Convex hull + hull cropping vs scipy's qhull as the oracle.

pcl::ConvexHull defers to the same qhull library, so matching scipy on
the full valid point set IS the PCL-parity contract; the approximate
(device support-point) path is additionally checked to be a tight inner
approximation.
"""
import numpy as np
import pytest

from pointcloud_stitching_tpu import PointCloud
from pointcloud_stitching_tpu.ops import convex_hull, crop_hull
from pointcloud_stitching_tpu.ops.hull import fibonacci_directions


def _cube_cloud(n=500, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    corners = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                        for z in (0, 1)], np.float32)
    return np.concatenate([pts, corners], axis=0)


def test_fibonacci_directions_unit_and_spread():
    d = fibonacci_directions(256)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    # mean of a uniform-ish spherical set is near the origin
    assert np.linalg.norm(d.mean(axis=0)) < 0.05


def test_exact_hull_matches_scipy():
    from scipy.spatial import ConvexHull as SciHull
    xyz = _cube_cloud()
    pc = PointCloud.from_points(xyz, capacity=768)
    h = convex_hull(pc, exact=True)
    ref = SciHull(xyz)
    assert h.volume == pytest.approx(ref.volume, rel=1e-6)
    assert h.area == pytest.approx(ref.area, rel=1e-6)
    assert h.volume == pytest.approx(1.0, rel=1e-6)  # the 8 corners
    assert set(map(tuple, h.vertices.tolist())) == \
        set(map(tuple, xyz[ref.vertices].tolist()))


def test_approx_hull_recovers_cube():
    # the 8 corners are each the support point of a wide cone of
    # directions, so even a sparse direction set finds them exactly
    xyz = _cube_cloud()
    pc = PointCloud.from_points(xyz, capacity=768)
    h = convex_hull(pc, n_dirs=512)
    assert h.volume == pytest.approx(1.0, rel=1e-6)
    # vertex_ids index the original padded cloud
    np.testing.assert_allclose(
        np.asarray(pc.xyz)[h.vertex_ids], h.vertices)


def test_approx_hull_is_tight_inner_approximation():
    from scipy.spatial import ConvexHull as SciHull
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(4000, 3)).astype(np.float32)
    pc = PointCloud.from_points(xyz)
    h = convex_hull(pc, n_dirs=2048)
    ref = SciHull(xyz)
    assert h.volume <= ref.volume * (1 + 1e-6)  # inner by construction
    assert h.volume >= 0.98 * ref.volume        # and tight at 2048 dirs


def test_hull_ignores_masked_points():
    xyz = _cube_cloud()
    spiked = np.concatenate([xyz, [[50.0, 50.0, 50.0]]], axis=0)
    mask = np.ones(len(spiked), bool)
    mask[-1] = False
    pc = PointCloud.from_points(spiked).replace(
        mask=np.asarray(mask))
    for exact in (False, True):
        h = convex_hull(pc, exact=exact)
        assert h.volume == pytest.approx(1.0, rel=1e-6)


def test_hull_faces_closed_and_outward():
    rng = np.random.default_rng(2)
    xyz = rng.normal(size=(500, 3)).astype(np.float32)
    h = convex_hull(PointCloud.from_points(xyz), exact=True)
    v, f = h.vertices, h.faces
    assert f.min() >= 0 and f.max() < len(v)
    # Euler characteristic of a closed genus-0 surface: V - E + F = 2
    edges = {tuple(sorted(e)) for t in f
             for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0]))}
    assert len(v) - len(edges) + len(f) == 2
    # each face wound outward: winding normal agrees with qhull's plane
    tri = v[f]
    wn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    assert (np.einsum("fi,fi->f", wn, h.equations[:, :3]) > 0).all()
    # divergence-theorem volume from the wound faces matches qhull's
    vol = np.einsum("fi,fi->f", tri[:, 0],
                    np.cross(tri[:, 1], tri[:, 2])).sum() / 6.0
    assert vol == pytest.approx(h.volume, rel=1e-5)


def test_hull_degenerate_raises():
    flat = np.zeros((10, 3), np.float32)
    flat[:, :2] = np.random.default_rng(3).normal(size=(10, 2))
    with pytest.raises(ValueError):
        convex_hull(PointCloud.from_points(flat), exact=True)
    with pytest.raises(ValueError):
        convex_hull(PointCloud.from_points(flat[:3]), exact=True)


def test_crop_hull_against_plane_oracle():
    xyz = _cube_cloud(400, seed=4)
    hull = convex_hull(PointCloud.from_points(xyz), exact=True)
    rng = np.random.default_rng(5)
    probe = rng.uniform(-0.5, 1.5, (2000, 3)).astype(np.float32)
    pc = PointCloud.from_points(probe)
    kept = crop_hull(pc, hull, eps=1e-6)
    # oracle: inside iff every qhull plane reports n.x + d <= eps
    d = probe @ hull.equations[:, :3].T + hull.equations[:, 3]
    inside = (d <= 1e-6).all(axis=1)
    np.testing.assert_array_equal(np.asarray(kept.mask), inside)
    inv = crop_hull(pc, hull, invert=True, eps=1e-6)
    np.testing.assert_array_equal(np.asarray(inv.mask), ~inside)


def test_crop_hull_keeps_own_points():
    # default eps scales with hull extent: the hull's own vertices must
    # survive f32 plane rounding both at the origin and far from it
    for offset in (0.0, 37.0):
        xyz = _cube_cloud(300, seed=6) + np.float32(offset)
        pc = PointCloud.from_points(xyz)
        hull = convex_hull(pc, exact=True)
        kept = crop_hull(pc, hull)
        assert bool(np.asarray(kept.mask).all()), f"offset={offset}"


def _l_shape_cloud(step=0.05):
    """Dense grid filling a unit cube minus one quarter column (an L
    prism): volume 0.75. Its CONVEX hull bridges the notch with a wedge
    (the corner triangle x+y>1.5 sweeps back in): volume 0.875."""
    g = np.arange(0.0, 1.0 + 1e-6, step)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    pts = np.stack([x, y, z], -1).reshape(-1, 3)
    inside = ~((pts[:, 0] > 0.5) & (pts[:, 1] > 0.5))
    return pts[inside].astype(np.float32)


def test_concave_hull_recovers_l_shape():
    from pointcloud_stitching_tpu.ops import concave_hull
    xyz = _l_shape_cloud()
    pc = PointCloud.from_points(xyz)
    h = concave_hull(pc, alpha=0.08)
    assert h.volume == pytest.approx(0.75, rel=0.03)
    cvx = convex_hull(pc, exact=True)
    assert cvx.volume == pytest.approx(0.875, rel=0.01)
    assert h.volume < cvx.volume - 0.08  # the notch survives
    # closed boundary: every edge borders an even number of faces (a
    # perfect lattice makes alpha shapes non-manifold at pinch edges —
    # counts of 4/6/8 — but never leaves an open edge; the divergence-
    # theorem volume check below is the decisive closure+winding test)
    edges = np.sort(h.faces[:, [[0, 1], [1, 2], [2, 0]]].reshape(-1, 2),
                    axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts % 2 == 0).all()
    # outward winding: divergence-theorem volume matches tet-sum volume
    tri = h.vertices[h.faces].astype(np.float64)
    vol = np.einsum("fi,fi->f", tri[:, 0],
                    np.cross(tri[:, 1], tri[:, 2])).sum() / 6.0
    assert vol == pytest.approx(h.volume, rel=1e-3)
    np.testing.assert_allclose(np.asarray(pc.xyz)[h.vertex_ids],
                               h.vertices)


def test_concave_hull_ignores_masked_and_rejects_tiny_alpha():
    from pointcloud_stitching_tpu.ops import concave_hull
    xyz = _l_shape_cloud(0.1)
    spiked = np.concatenate([xyz, [[9.0, 9.0, 9.0]]], axis=0)
    mask = np.ones(len(spiked), bool)
    mask[-1] = False
    pc = PointCloud.from_points(spiked).replace(mask=np.asarray(mask))
    h = concave_hull(pc, alpha=0.16)
    assert np.abs(h.vertices).max() < 2.0
    with pytest.raises(ValueError):
        concave_hull(pc, alpha=1e-6)


def test_concave_hull_planar_notched_square():
    from pointcloud_stitching_tpu.ops import concave_hull
    g = np.arange(0.0, 1.0 + 1e-6, 0.05)
    x, y = np.meshgrid(g, g, indexing="ij")
    pts2 = np.stack([x, y], -1).reshape(-1, 2)
    inside = ~((pts2[:, 0] > 0.5) & (pts2[:, 1] > 0.5))
    pts2 = pts2[inside]
    # embed the 2-D shape on a tilted plane in 3-D
    e1 = np.array([1.0, 0.0, 0.5]) / np.linalg.norm([1.0, 0.0, 0.5])
    e2 = np.array([0.0, 1.0, -0.2]) / np.linalg.norm([0.0, 1.0, -0.2])
    xyz = (pts2[:, :1] * e1 + pts2[:, 1:] * e2).astype(np.float32)
    pc = PointCloud.from_points(xyz)
    h = concave_hull(pc, alpha=0.08, planar=True)
    # area is measured in the projected plane; the basis is not quite
    # orthonormal here so allow a few percent
    assert h.area == pytest.approx(0.75, rel=0.10)
    assert h.volume == 0.0 and h.faces.size == 0
    assert len(h.rings) == 1  # a single boundary loop, ordered
    ring = h.rings[0]
    assert len(ring) >= 20
    # consecutive ring vertices are near-neighbors on the grid
    rv = h.vertices[ring]
    step = np.linalg.norm(np.diff(np.vstack([rv, rv[:1]]), axis=0),
                          axis=1)
    assert step.max() < 0.12


def test_crop_hull_traceable_with_planes():
    import jax
    xyz = _cube_cloud(300, seed=7)
    hull = convex_hull(PointCloud.from_points(xyz), exact=True)
    probe = np.random.default_rng(8).uniform(-0.5, 1.5, (512, 3))
    pc = PointCloud.from_points(probe.astype(np.float32))
    f = jax.jit(lambda p, planes: crop_hull(p, planes))
    got = f(pc, hull.equations)
    ref = crop_hull(pc, hull)
    np.testing.assert_array_equal(np.asarray(got.mask),
                                  np.asarray(ref.mask))


def test_chain_rings_drops_open_chains():
    from pointcloud_stitching_tpu.ops.hull import _chain_rings
    # closed square 0-1-2-3 plus a dangling open path 4-5-6: only the
    # square may come back as a ring
    edges = np.array([[0, 1], [1, 2], [2, 3], [3, 0],
                      [4, 5], [5, 6]], np.int32)
    rings = _chain_rings(edges)
    assert len(rings) == 1 and sorted(rings[0].tolist()) == [0, 1, 2, 3]
