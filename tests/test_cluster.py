"""Euclidean cluster extraction (pcl::EuclideanClusterExtraction role)."""
import os

import jax.numpy as jnp
import numpy as np

from pointcloud_stitching_tpu import PointCloud
from pointcloud_stitching_tpu.ops.cluster import euclidean_clusters


def _cloud(pts, cap=None):
    pts = np.asarray(pts, np.float32)
    cap = cap or len(pts)
    xyz = np.zeros((cap, 3), np.float32)
    mask = np.zeros((cap,), bool)
    xyz[:len(pts)] = pts
    mask[:len(pts)] = True
    return PointCloud(xyz=jnp.asarray(xyz), mask=jnp.asarray(mask))


def _blob(center, n, spread, seed):
    rng = np.random.default_rng(seed)
    return np.asarray(center) + rng.uniform(-spread, spread, (n, 3))


def test_three_separated_blobs():
    tol = 0.05
    blobs = [_blob((0, 0, 0), 400, 0.1, 1),
             _blob((3, 0, 0), 200, 0.1, 2),
             _blob((0, 3, 0), 100, 0.1, 3)]
    pc = _cloud(np.concatenate(blobs), cap=1024)
    labels, num, sizes = euclidean_clusters(pc, tol, min_size=5)
    labels = np.asarray(labels)
    assert int(num) == 3
    np.testing.assert_array_equal(np.asarray(sizes)[:3], [400, 200, 100])
    # largest-first ids and each blob uniform
    assert set(labels[:400]) == {0}
    assert set(labels[400:600]) == {1}
    assert set(labels[600:700]) == {2}
    assert set(labels[700:]) == {-1}  # padding


def test_min_size_drops_small_clusters():
    tol = 0.05
    pts = np.concatenate([_blob((0, 0, 0), 100, 0.05, 1),
                          np.array([[5.0, 5.0, 5.0]])])  # a singleton
    pc = _cloud(pts)
    labels, num, sizes = euclidean_clusters(pc, tol, min_size=5)
    assert int(num) == 1
    assert np.asarray(labels)[-1] == -1  # the singleton is dropped
    labels2, num2, _ = euclidean_clusters(pc, tol, min_size=1)
    assert int(num2) == 2
    assert np.asarray(labels2)[-1] == 1


def test_long_chain_converges():
    """An elongated cluster stresses propagation diameter: 600 collinear
    points spaced inside the tolerance must resolve to ONE cluster (the
    pointer-jumping rounds, not a diameter-long loop)."""
    tol = 0.05
    t = np.arange(600) * (0.9 * tol)
    pts = np.stack([t, np.zeros_like(t), np.zeros_like(t)], -1)
    pc = _cloud(pts)
    labels, num, sizes = euclidean_clusters(pc, tol)
    assert int(num) == 1
    assert int(np.asarray(sizes)[0]) == 600
    assert set(np.asarray(labels)) == {0}


def test_matches_numpy_voxel_bfs_oracle():
    """Random scene vs an independent numpy BFS over the same
    voxel-connectivity graph: identical partitions (up to relabeling)."""
    rng = np.random.default_rng(7)
    pts = rng.uniform(0, 1.0, (500, 3)).astype(np.float32)
    tol = 0.08
    pc = _cloud(pts, cap=600)
    labels, num, _ = euclidean_clusters(pc, tol, min_size=1,
                                        max_clusters=64)
    labels = np.asarray(labels)[:500]

    # oracle: BFS over 26-adjacent occupied voxels (reciprocal-multiply
    # indexing like the library, tests/oracle.py convention)
    ijk = np.floor(pts * (1.0 / tol)).astype(np.int64)
    ijk -= ijk.min(axis=0)
    vox = {}
    for i, t in enumerate(map(tuple, ijk)):
        vox.setdefault(t, []).append(i)
    seen = {}
    comp = 0
    for start in vox:
        if start in seen:
            continue
        stack = [start]
        seen[start] = comp
        while stack:
            cur = stack.pop()
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dz in (-1, 0, 1):
                        nb = (cur[0] + dx, cur[1] + dy, cur[2] + dz)
                        if nb in vox and nb not in seen:
                            seen[nb] = comp
                            stack.append(nb)
        comp += 1
    want = np.array([seen[tuple(t)] for t in ijk])

    # same partition: the label pairs must be a bijection
    assert (labels >= 0).all()
    pairs = set(zip(labels.tolist(), want.tolist()))
    assert len(pairs) == len(set(labels)) == len(set(want))
    assert int(num) == min(comp, 64)


def test_empty_and_all_invalid():
    pc = PointCloud(xyz=jnp.zeros((32, 3)), mask=jnp.zeros((32,), bool))
    labels, num, sizes = euclidean_clusters(pc, 0.05)
    assert int(num) == 0
    assert set(np.asarray(labels)) == {-1}
    assert int(np.asarray(sizes).sum()) == 0


def test_after_plane_removal_workflow():
    """The canonical pipeline: drop the floor, cluster the objects."""
    import jax
    from pointcloud_stitching_tpu.ops import extract_plane, segment_plane
    rng = np.random.default_rng(0)
    floor = np.stack([rng.uniform(-2, 2, 3000), rng.uniform(-2, 2, 3000),
                      np.zeros(3000)], -1)
    obj1 = _blob((0.5, 0.5, 0.3), 300, 0.08, 1)
    obj2 = _blob((-0.8, 0.2, 0.4), 150, 0.08, 2)
    pc = _cloud(np.concatenate([floor, obj1, obj2]), cap=4096)
    model, _, _ = segment_plane(pc, 0.02, jax.random.key(0))
    rest = extract_plane(pc, model, 0.05)
    labels, num, sizes = euclidean_clusters(rest, 0.06, min_size=20)
    assert int(num) == 2
    s = np.asarray(sizes)
    assert 250 <= s[0] <= 300 and 120 <= s[1] <= 150, s[:3]


def test_cluster_stats():
    tol = 0.05
    b1 = _blob((0, 0, 0), 300, 0.1, 1)
    b2 = _blob((3, 0, 1), 100, 0.05, 2)
    pc = _cloud(np.concatenate([b1, b2]), cap=512)
    labels, num, _ = euclidean_clusters(pc, tol, min_size=5)
    from pointcloud_stitching_tpu.ops import cluster_stats
    cent, lo, hi, cnt = cluster_stats(pc, labels)
    cent, lo, hi, cnt = map(np.asarray, (cent, lo, hi, cnt))
    assert cnt[0] == 300 and cnt[1] == 100
    np.testing.assert_allclose(cent[0], b1.mean(axis=0), atol=1e-4)
    np.testing.assert_allclose(cent[1], b2.mean(axis=0), atol=1e-4)
    np.testing.assert_allclose(lo[1], b2.min(axis=0), atol=1e-5)
    np.testing.assert_allclose(hi[1], b2.max(axis=0), atol=1e-5)
    # absent clusters are zero rows with zero counts
    assert cnt[2:].sum() == 0 and np.abs(cent[2:]).sum() == 0


def test_scene_past_int32_key_bound_fails_safe():
    """Extent/tolerance combinations whose linearized key would overflow
    int32 must return the documented empty output, never welded clusters."""
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1000.0, (256, 3)).astype(np.float32)
    pc = _cloud(pts)
    labels, num, sizes = euclidean_clusters(pc, 1e-4, min_size=1)
    assert int(num) == 0
    assert set(np.asarray(labels)) == {-1}
    assert int(np.asarray(sizes).sum()) == 0


def test_segment_cli_end_to_end(tmp_path):
    """pcs-segment: PLY in -> plane removed -> per-cluster PLYs out."""
    from pointcloud_stitching_tpu.io import load_ply
    from pointcloud_stitching_tpu.io.plyio import save_ply
    from pointcloud_stitching_tpu.tools import segment_cli
    rng = np.random.default_rng(0)
    floor = np.stack([rng.uniform(-2, 2, 3000), rng.uniform(-2, 2, 3000),
                      np.zeros(3000)], -1)
    obj1 = _blob((0.5, 0.5, 0.3), 300, 0.08, 1)
    obj2 = _blob((-0.8, 0.2, 0.4), 150, 0.08, 2)
    inp = str(tmp_path / "scene.ply")
    save_ply(inp, np.concatenate([floor, obj1, obj2]).astype(np.float32))
    out = str(tmp_path / "clusters")
    n = segment_cli.main([inp, out, "--drop-plane", "0.03",
                          "--tolerance", "0.06", "--min-size", "20"])
    assert n == 2
    xyz0, _ = load_ply(os.path.join(out, "cluster_00.ply"))
    xyz1, _ = load_ply(os.path.join(out, "cluster_01.ply"))
    assert len(xyz0) >= len(xyz1) >= 100
    np.testing.assert_allclose(xyz0.mean(axis=0), obj1.mean(axis=0),
                               atol=0.05)


def test_segment_cli_hull_flag(tmp_path):
    """--hull writes a per-cluster convex hull mesh alongside the cloud."""
    from pointcloud_stitching_tpu.tools import segment_cli
    rng = np.random.default_rng(3)
    cube = rng.uniform(0, 0.2, (400, 3)).astype(np.float32)
    inp = str(tmp_path / "scene.ply")
    from pointcloud_stitching_tpu.io.plyio import save_ply
    save_ply(inp, cube)
    out = str(tmp_path / "clusters")
    n = segment_cli.main([inp, out, "--tolerance", "0.08",
                          "--min-size", "20", "--hull"])
    assert n == 1
    hull_path = os.path.join(out, "cluster_00_hull.ply")
    assert os.path.exists(hull_path)
    from pointcloud_stitching_tpu.io import load_ply
    verts, _ = load_ply(hull_path)
    assert len(verts) >= 4


# ---------------------------------------------------- exact-radius variant

def _bfs_exact_np(xyz, mask, tol):
    """Independent oracle: BFS over the exact radius graph."""
    n = len(xyz)
    d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    adj = (d2 <= tol * tol) & mask[:, None] & mask[None, :]
    comp = np.full(n, -1)
    c = 0
    for s in range(n):
        if not mask[s] or comp[s] >= 0:
            continue
        stack = [s]
        comp[s] = c
        while stack:
            i = stack.pop()
            for j in np.nonzero(adj[i] & (comp < 0))[0]:
                comp[j] = c
                stack.append(j)
        c += 1
    return comp


def _rank_np(comp, min_size, max_clusters):
    """largest-first size-filtered relabel, matching the library contract."""
    ids, sizes = np.unique(comp[comp >= 0], return_counts=True)
    order = np.argsort(-sizes, kind="stable")
    out = np.full(len(comp), -1)
    rank = 0
    for o in order[:max_clusters]:
        if sizes[o] >= min_size:
            out[comp == ids[o]] = rank
            rank += 1
    return out, rank


def test_exact_matches_bfs_oracle():
    from pointcloud_stitching_tpu.ops.cluster import euclidean_clusters_exact
    rng = np.random.default_rng(7)
    xyz = rng.uniform(0, 1.0, (300, 3)).astype(np.float32)
    mask = rng.uniform(size=300) > 0.15
    tol = 0.12
    pc = PointCloud(xyz=jnp.asarray(xyz), mask=jnp.asarray(mask))
    labels, num, sizes = euclidean_clusters_exact(
        pc, tol, min_size=2, max_clusters=8, query_tile=64, ref_tile=64)
    comp = _bfs_exact_np(xyz, mask, tol)
    want, want_num = _rank_np(comp, 2, 8)
    got = np.asarray(labels)
    assert int(num) == want_num
    # same partition: cluster ids must map 1:1 (sizes can tie-break
    # differently, so compare as partitions of the point set)
    for g in range(int(num)):
        members = got == g
        assert members.any()
        w = want[members]
        assert (w == w[0]).all() and w[0] >= 0
        assert ((want == w[0]) == members).all()
    assert ((got == -1) == (want == -1)).all()


def test_exact_splits_what_voxel_adjacency_merges():
    """Two clusters separated by MORE than tolerance but LESS than the
    voxel variant's 2*sqrt(3)*tolerance worst case, placed diagonally so
    they land in adjacent voxels: the voxel variant merges them (its
    documented over-approximation), the exact variant must not."""
    from pointcloud_stitching_tpu.ops.cluster import euclidean_clusters_exact
    tol = 0.1
    # two tight pancakes along the (1,1,1) diagonal, gap ~ 1.55*tol
    a = _blob((0.049, 0.049, 0.049), 60, 0.004, 1)
    b = _blob((0.139, 0.139, 0.139), 60, 0.004, 2)
    pc = _cloud(np.concatenate([a, b]))
    lab_v, num_v, _ = euclidean_clusters(pc, tol, max_clusters=4)
    lab_e, num_e, _ = euclidean_clusters_exact(pc, tol, max_clusters=4,
                                               query_tile=32, ref_tile=32)
    assert int(num_v) == 1          # documents the approximation
    assert int(num_e) == 2
    got = np.asarray(lab_e)
    assert (got[:60] == got[0]).all() and (got[60:] == got[60]).all()
    assert got[0] != got[60]


def test_exact_chain_and_all_invalid():
    from pointcloud_stitching_tpu.ops.cluster import euclidean_clusters_exact
    # 200-point chain at 0.9*tol spacing: one cluster, needs propagation
    # to converge across the whole chain
    tol = 0.05
    pts = np.stack([np.arange(200) * 0.045, np.zeros(200),
                    np.zeros(200)], 1)
    pc = _cloud(pts)
    lab, num, sizes = euclidean_clusters_exact(pc, tol, max_clusters=4,
                                               query_tile=64, ref_tile=64)
    assert int(num) == 1 and int(sizes[0]) == 200
    assert (np.asarray(lab) == 0).all()
    empty = PointCloud(xyz=pc.xyz, mask=jnp.zeros(200, bool))
    lab, num, _ = euclidean_clusters_exact(empty, tol)
    assert int(num) == 0 and (np.asarray(lab) == -1).all()


def test_segment_cli_exact_flag(tmp_path):
    """--exact drives the exact-radius variant through the same CLI."""
    from pointcloud_stitching_tpu.io import load_ply
    from pointcloud_stitching_tpu.io.plyio import save_ply
    from pointcloud_stitching_tpu.tools import segment_cli
    obj1 = _blob((0.5, 0.5, 0.3), 200, 0.05, 4)
    obj2 = _blob((-0.8, 0.2, 0.4), 120, 0.05, 5)
    inp = str(tmp_path / "scene.ply")
    save_ply(inp, np.concatenate([obj1, obj2]).astype(np.float32))
    out = str(tmp_path / "clusters")
    n = segment_cli.main([inp, out, "--tolerance", "0.08",
                          "--min-size", "20", "--exact"])
    assert n == 2
    xyz0, _ = load_ply(os.path.join(out, "cluster_00.ply"))
    assert len(xyz0) == 200


# ------------------------------------------------------- region growing

def _l_shape(step=0.02, extent=0.5):
    """Two perpendicular planes sharing an edge (the y axis): the classic
    region-growing scene. Returns (xyz, normals) with analytic normals."""
    g = np.arange(step, extent, step, dtype=np.float32)
    y = np.arange(0, extent, step, dtype=np.float32)
    ax, ay = np.meshgrid(g, y, indexing="ij")
    a = np.stack([ax.ravel(), ay.ravel(), np.zeros(ax.size)], 1)
    bz, by = np.meshgrid(g, y, indexing="ij")
    b = np.stack([np.zeros(bz.size), by.ravel(), bz.ravel()], 1)
    edge = np.stack([np.zeros(len(y)), y, np.zeros(len(y))], 1)
    xyz = np.concatenate([a, b, edge]).astype(np.float32)
    nrm = np.concatenate([
        np.tile([0.0, 0.0, 1.0], (len(a), 1)),
        np.tile([1.0, 0.0, 0.0], (len(b), 1)),
        np.tile([np.sqrt(0.5), 0.0, np.sqrt(0.5)], (len(edge), 1)),
    ]).astype(np.float32)
    return xyz, nrm, len(a), len(b)


def test_region_growing_splits_at_crease():
    """Euclidean connectivity sees ONE L-shaped component; the smoothness
    gate must split it into the two planes."""
    from pointcloud_stitching_tpu.ops.cluster import (
        euclidean_clusters_exact, region_growing)
    xyz, nrm, na, nb = _l_shape()
    pc = _cloud(xyz)
    _, num_e, _ = euclidean_clusters_exact(pc, 0.03, max_clusters=4,
                                           query_tile=256, ref_tile=256)
    assert int(num_e) == 1
    lab, num, sizes = region_growing(pc, jnp.asarray(nrm), 0.03,
                                     np.deg2rad(20.0), max_clusters=4,
                                     query_tile=256, ref_tile=256)
    # three regions: plane A, plane B, and the 45-degree edge line (its
    # points all share the edge normal, so they connect to each other but
    # to neither plane)
    assert int(num) == 3
    got = np.asarray(lab)
    assert (got[:na] == got[0]).all()
    assert (got[na:na + nb] == got[na]).all()
    assert (got[na + nb:] == got[na + nb]).all()
    assert len({got[0], got[na], got[na + nb]}) == 3
    assert int(sizes[2]) == len(xyz) - na - nb


def test_region_growing_sign_flip_invariant():
    """|n_i . n_j| comparison: flipping random normal signs (orientation is
    arbitrary for unoriented scans) must not change the segmentation."""
    from pointcloud_stitching_tpu.ops.cluster import region_growing
    xyz, nrm, na, nb = _l_shape(step=0.04)
    rng = np.random.default_rng(0)
    flip = np.where(rng.uniform(size=len(xyz)) > 0.5, -1.0, 1.0)[:, None]
    pc = _cloud(xyz)
    lab1, num1, _ = region_growing(pc, jnp.asarray(nrm), 0.06,
                                   np.deg2rad(20.0), max_clusters=4)
    lab2, num2, _ = region_growing(pc, jnp.asarray(nrm * flip), 0.06,
                                   np.deg2rad(20.0), max_clusters=4)
    assert int(num1) == int(num2) == 3
    assert np.array_equal(np.asarray(lab1), np.asarray(lab2))


def test_region_growing_chains_across_smooth_curvature():
    """PCL smooth-mode semantics: smoothness is pairwise, so a gently
    curved surface whose TOTAL normal variation far exceeds the threshold
    still forms one region (adjacent normals agree)."""
    from pointcloud_stitching_tpu.ops.cluster import region_growing
    t = np.linspace(0, np.pi / 2, 80, dtype=np.float32)   # quarter cylinder
    y = np.linspace(0, 0.3, 12, dtype=np.float32)
    tt, yy = np.meshgrid(t, y, indexing="ij")
    xyz = np.stack([np.cos(tt).ravel(), yy.ravel(),
                    np.sin(tt).ravel()], 1).astype(np.float32)
    nrm = np.stack([np.cos(tt).ravel(), np.zeros(tt.size),
                    np.sin(tt).ravel()], 1).astype(np.float32)
    pc = _cloud(xyz)
    lab, num, sizes = region_growing(pc, jnp.asarray(nrm), 0.05,
                                     np.deg2rad(10.0), max_clusters=4)
    assert int(num) == 1 and int(sizes[0]) == len(xyz)


def test_region_growing_curvature_gate():
    """estimate_curvature scores the crease high; gating on it removes
    crease points from every region (PCL's curvature test role)."""
    from pointcloud_stitching_tpu.ops.cluster import region_growing
    from pointcloud_stitching_tpu.ops.mls import estimate_curvature
    xyz, nrm, na, nb = _l_shape()
    pc = _cloud(xyz)
    curv, okc = estimate_curvature(pc, 0.06)
    c = np.asarray(curv)
    # interior plane points are flat, crease-line points are not
    interior = c[na // 2]           # deep inside plane A
    crease = c[na + nb:]            # the shared-edge points
    assert interior < 0.01, interior
    assert crease.min() > 5 * max(interior, 1e-4), crease.min()
    lab, num, _ = region_growing(pc, jnp.asarray(nrm), 0.03,
                                 np.deg2rad(20.0), curvature=curv,
                                 curvature_threshold=0.02, max_clusters=4)
    got = np.asarray(lab)
    assert int(num) == 2
    assert (got[na + nb:] == -1).all()


def test_segment_cli_smooth_angle(tmp_path):
    """--smooth-angle segments an L-shape into its two planes through the
    full estimated-normal region-growing path."""
    from pointcloud_stitching_tpu.io import load_ply
    from pointcloud_stitching_tpu.io.plyio import save_ply
    from pointcloud_stitching_tpu.tools import segment_cli
    xyz, _, na, nb = _l_shape()
    inp = str(tmp_path / "l.ply")
    save_ply(inp, xyz)
    out = str(tmp_path / "regions")
    n = segment_cli.main([inp, out, "--tolerance", "0.03",
                          "--smooth-angle", "20",
                          "--max-curvature", "0.02",
                          "--min-size", "50"])
    assert n == 2
    xyz0, _ = load_ply(os.path.join(out, "cluster_00.ply"))
    xyz1, _ = load_ply(os.path.join(out, "cluster_01.ply"))
    # one flat-z plane, one flat-x plane (order by size is tied -> check set)
    flat = {("z" if np.ptp(c[:, 2]) < 1e-4 else "x") for c in (xyz0, xyz1)}
    assert flat == {"z", "x"}


# --- oriented bounding boxes (pcl::MomentOfInertiaEstimation getOBB role)

def _rot(seed):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2*(y*y + z*z), 2*(x*y - w*z), 2*(x*z + w*y)],
        [2*(x*y + w*z), 1 - 2*(x*x + z*z), 2*(y*z - w*x)],
        [2*(x*z - w*y), 2*(y*z + w*x), 1 - 2*(x*x + y*y)]])


def test_obb_recovers_rotated_boxes():
    from pointcloud_stitching_tpu.ops.cluster import oriented_bboxes
    rng = np.random.default_rng(7)
    true_half = [np.array([0.5, 0.2, 0.05]), np.array([0.3, 0.25, 0.1])]
    offs = [np.array([0.0, 0.0, 1.0]), np.array([5.0, 0.0, 1.0])]
    pts, labels = [], []
    rots = [_rot(1), _rot(2)]
    for k in range(2):
        p = rng.uniform(-1, 1, (4000, 3)) * true_half[k]
        pts.append(p @ rots[k].T + offs[k])
        labels.append(np.full(4000, k))
    pc = _cloud(np.concatenate(pts))
    labels = jnp.asarray(np.concatenate(labels).astype(np.int32))
    centers, axes, half, cnt = oriented_bboxes(pc, labels, max_clusters=4)
    centers, axes, half, cnt = (np.asarray(centers), np.asarray(axes),
                                np.asarray(half), np.asarray(cnt))
    assert cnt.tolist() == [4000, 4000, 0, 0]
    assert np.all(half[2:] == 0) and np.all(centers[2:] == 0)
    for k in range(2):
        # orthonormal right-handed frame
        np.testing.assert_allclose(axes[k] @ axes[k].T, np.eye(3),
                                   atol=1e-5)
        assert np.linalg.det(axes[k]) > 0.99
        # every point inside, extents achieved
        q = (pc.xyz[labels == k] - centers[k]) @ axes[k].T
        assert np.all(np.abs(q) <= half[k] + 1e-4)
        np.testing.assert_allclose(np.abs(q).max(0), half[k], atol=1e-4)
        # dense uniform fill: recovered box ~= the true box (sorted)
        np.testing.assert_allclose(np.sort(half[k]),
                                   np.sort(true_half[k]), rtol=0.06)
        # major axis aligns with the true long axis (up to sign)
        major_true = rots[k][:, np.argmax(true_half[k])]
        assert abs(axes[k, 0] @ major_true) > 0.99


def test_obb_tighter_than_aabb_when_rotated():
    from pointcloud_stitching_tpu.ops.cluster import (cluster_stats,
                                                      oriented_bboxes)
    rng = np.random.default_rng(3)
    p = rng.uniform(-1, 1, (3000, 3)) * [0.6, 0.1, 0.02]
    r = _rot(9)
    pc = _cloud(p @ r.T + [1.0, 2.0, 3.0])
    labels = jnp.zeros((3000,), jnp.int32)
    _, lo, hi, _ = cluster_stats(pc, labels, max_clusters=1)
    _, _, half, _ = oriented_bboxes(pc, labels, max_clusters=1)
    vol_aabb = float(np.prod(np.asarray(hi[0]) - np.asarray(lo[0])))
    vol_obb = float(np.prod(2 * np.asarray(half[0])))
    assert vol_obb < 0.7 * vol_aabb


def test_obb_degenerate_single_point():
    from pointcloud_stitching_tpu.ops.cluster import oriented_bboxes
    pc = _cloud([[1.0, 2.0, 3.0]])
    labels = jnp.zeros((1,), jnp.int32)
    centers, axes, half, cnt = oriented_bboxes(pc, labels, max_clusters=2)
    assert int(cnt[0]) == 1
    np.testing.assert_allclose(np.asarray(centers[0]), [1, 2, 3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(half[0]), 0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(axes[0]) @ np.asarray(axes[0]).T, np.eye(3), atol=1e-5)
