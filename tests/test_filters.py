"""Filters: passthrough / crop-box / radius outlier removal vs numpy oracle."""
import numpy as np
import pytest

from pointcloud_stitching_tpu import PointCloud
from pointcloud_stitching_tpu.ops import (count_neighbors, crop_box,
                                          knn_mean_distance, passthrough,
                                          radius_outlier_removal,
                                          statistical_outlier_removal)


def _cloud(rng, n=3000, pad=512):
    xyz = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    return xyz, PointCloud.from_points(xyz, capacity=n + pad)


def count_neighbors_np(xyz, mask, radius):
    """Oracle: other valid points within radius (inclusive), self excluded."""
    out = np.zeros(len(xyz), np.int32)
    valid = np.flatnonzero(mask)
    v = xyz[valid]
    for i in valid:
        d2 = np.sum((v - xyz[i]) ** 2, axis=1)
        out[i] = int(np.sum(d2 <= radius * radius)) - 1
    return out


def test_passthrough_matches_numpy(rng):
    xyz, pc = _cloud(rng)
    out = passthrough(pc, axis=2, lo=-0.5, hi=1.0)
    want = (xyz[:, 2] >= -0.5) & (xyz[:, 2] <= 1.0)
    got = np.asarray(out.mask)
    np.testing.assert_array_equal(got[:len(xyz)], want)
    assert not got[len(xyz):].any()  # padding stays invalid
    # invert = setNegative
    inv = passthrough(pc, axis=2, lo=-0.5, hi=1.0, invert=True)
    np.testing.assert_array_equal(np.asarray(inv.mask)[:len(xyz)], ~want)
    # geometry untouched (mask-only filter)
    np.testing.assert_array_equal(np.asarray(out.xyz), np.asarray(pc.xyz))


def test_crop_box_matches_numpy(rng):
    xyz, pc = _cloud(rng)
    lo, hi = np.float32([-1, -0.5, 0]), np.float32([1, 1.5, 2])
    out = crop_box(pc, lo, hi)
    want = np.all((xyz >= lo) & (xyz <= hi), axis=1)
    np.testing.assert_array_equal(np.asarray(out.mask)[:len(xyz)], want)
    inv = crop_box(pc, lo, hi, invert=True)
    np.testing.assert_array_equal(np.asarray(inv.mask)[:len(xyz)], ~want)


def test_count_neighbors_matches_numpy(rng):
    xyz, pc = _cloud(rng, n=1500, pad=100)
    # odd tile sizes exercise the padded-block edges
    counts = np.asarray(count_neighbors(pc, 0.35, query_tile=256,
                                        ref_tile=192))
    want = count_neighbors_np(np.asarray(pc.xyz), np.asarray(pc.mask), 0.35)
    np.testing.assert_array_equal(counts, want)
    assert want.max() > 3  # the radius actually captures neighborhoods


def test_count_neighbors_ignores_invalid_and_duplicates_count():
    xyz = np.array([[0, 0, 0], [0, 0, 0], [0.05, 0, 0], [5, 5, 5]],
                   np.float32)
    pc = PointCloud.from_points(xyz, capacity=8)
    mask = np.asarray(pc.mask).copy()
    mask[3] = False  # invalidate the far point AND exclude it from counts
    pc = pc.replace(mask=mask)
    counts = np.asarray(count_neighbors(pc, 0.1))
    # duplicates see each other + the 0.05 point; self never counted
    np.testing.assert_array_equal(counts[:4], [2, 2, 2, 0])
    assert counts[4:].sum() == 0


def test_radius_outlier_removal(rng):
    """A dense cluster survives; injected isolated points drop."""
    cluster = rng.normal(0, 0.05, (2000, 3)).astype(np.float32)
    lonely = np.float32([[3, 3, 3], [-4, 0, 2], [0, 5, -1]])
    xyz = np.concatenate([cluster, lonely])
    pc = PointCloud.from_points(xyz, capacity=2560)
    out = radius_outlier_removal(pc, radius=0.05, min_neighbors=4)
    got = np.asarray(out.mask)
    want = count_neighbors_np(
        np.asarray(pc.xyz), np.asarray(pc.mask), 0.05) >= 4
    want &= np.asarray(pc.mask)
    np.testing.assert_array_equal(got, want)
    assert not got[2000:2003].any()      # isolated points removed
    assert got[:2000].mean() > 0.9       # cluster interior survives


def test_filters_are_traced_no_recompile(rng):
    """Bounds are traced: changing them must not recompile."""
    import jax

    _, pc = _cloud(rng, n=1024, pad=0)
    f = jax.jit(lambda p, lo, hi: passthrough(p, 2, lo, hi))
    with jax.log_compiles():
        f(pc, -1.0, 1.0)
    n0 = f._cache_size()
    f(pc, -0.2, 0.7)
    f(pc, 0.0, 0.1)
    assert f._cache_size() == n0
    g = lambda p, r, k: radius_outlier_removal(p, r, k)
    gj = jax.jit(g)
    gj(pc, 0.2, 3)
    n0 = gj._cache_size()
    gj(pc, 0.4, 7)
    assert gj._cache_size() == n0


def knn_mean_distance_np(xyz, mask, k):
    """Oracle: mean distance to the k nearest other valid points."""
    out = np.zeros(len(xyz), np.float64)
    valid = np.flatnonzero(mask)
    v = xyz[valid]
    for i in valid:
        d = np.sqrt(np.sum((v - xyz[i]) ** 2, axis=1))
        d = np.sort(d)[1:k + 1]  # drop the self-match
        out[i] = d.mean() if len(d) else 0.0
    return out.astype(np.float32)


def test_knn_mean_distance_matches_numpy(rng):
    xyz, pc = _cloud(rng, n=900, pad=124)
    got = np.asarray(knn_mean_distance(pc, 8, query_tile=128, ref_tile=256))
    want = knn_mean_distance_np(np.asarray(pc.xyz), np.asarray(pc.mask), 8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_statistical_outlier_removal(rng):
    """PCL SOR contract: threshold = mean + std_ratio * sample stddev of
    the k-NN mean distances; the injected far points fall past it."""
    cluster = rng.normal(0, 0.05, (1500, 3)).astype(np.float32)
    lonely = np.float32([[2, 2, 2], [-3, 0, 1]])
    xyz = np.concatenate([cluster, lonely])
    pc = PointCloud.from_points(xyz, capacity=1664)
    out = statistical_outlier_removal(pc, k=16, std_ratio=1.0)
    got = np.asarray(out.mask)
    md = knn_mean_distance_np(np.asarray(pc.xyz), np.asarray(pc.mask), 16)
    valid = np.asarray(pc.mask)
    vals = md[valid]
    thresh = vals.mean() + vals.std(ddof=1)
    want = valid & (md <= thresh)
    np.testing.assert_array_equal(got, want)
    assert not got[1500:1502].any()
    assert got[:1500].mean() > 0.8


def test_count_neighbors_batched(rng):
    xyz = rng.uniform(-1, 1, (3, 700, 3)).astype(np.float32)
    mask = np.ones((3, 700), bool)
    mask[1, ::3] = False
    pc = PointCloud(xyz=xyz, mask=mask)
    counts = np.asarray(count_neighbors(pc, 0.3, query_tile=128,
                                        ref_tile=256))
    for b in range(3):
        want = count_neighbors_np(xyz[b], mask[b], 0.3)
        np.testing.assert_array_equal(counts[b], want)


def test_frustum_cull_roundtrip_and_box():
    """Every point deprojected from a camera is inside that camera's
    frustum; points behind it or outside the image are not."""
    import jax.numpy as jnp
    from pointcloud_stitching_tpu import Intrinsics, PointCloud
    from pointcloud_stitching_tpu.ops import deproject, frustum_cull
    from oracle import synth_depth_frame, random_se3

    h, w = 60, 106
    intr = Intrinsics.create(fx=80.0, fy=80.0, ppx=w / 2, ppy=h / 2,
                             width=w, height=h)
    depth = synth_depth_frame(h, w, seed=0)
    pc = deproject(jnp.asarray(depth), intr)
    got = frustum_cull(pc, intr)
    # the camera sees everything it produced (identity extrinsic)
    np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(pc.mask))

    # world-frame variant: transform the cloud out, cull with the same cal
    T = random_se3(seed=3, max_angle=0.5, max_trans=1.0)
    from pointcloud_stitching_tpu.ops import se3_apply
    world = pc.replace(xyz=se3_apply(jnp.asarray(T), pc.xyz))
    got2 = frustum_cull(world, intr, extrinsic=jnp.asarray(T))
    np.testing.assert_array_equal(np.asarray(got2.mask),
                                  np.asarray(pc.mask))

    # points clearly outside: behind the camera / beyond z_max / off-image
    bad = PointCloud(
        xyz=jnp.asarray(np.array([[0, 0, -1.0], [0, 0, 50.0],
                                  [10.0, 0, 1.0]], np.float32)),
        mask=jnp.ones((3,), bool))
    m = np.asarray(frustum_cull(bad, intr, z_max=10.0).mask)
    assert not m.any()
    # invert keeps exactly the complement
    mi = np.asarray(frustum_cull(bad, intr, z_max=10.0, invert=True).mask)
    assert mi.all()


# --- bilateral depth filter (pcl::FastBilateralFilter role) -------------

def bilateral_np(depth, sigma_s, sigma_r_raw, radius):
    """Direct O(HW k^2) oracle in float64."""
    z = depth.astype(np.float64)
    valid = z > 0
    h, w = z.shape
    out = np.zeros_like(z)
    for i in range(h):
        for j in range(w):
            if not valid[i, j]:
                continue
            num = den = 0.0
            for di in range(-radius, radius + 1):
                for dj in range(-radius, radius + 1):
                    ii, jj = i + di, j + dj
                    if not (0 <= ii < h and 0 <= jj < w):
                        continue
                    if not valid[ii, jj]:
                        continue
                    wgt = np.exp(-(di * di + dj * dj) / (2 * sigma_s ** 2)
                                 - (z[ii, jj] - z[i, j]) ** 2
                                 / (2 * sigma_r_raw ** 2))
                    num += wgt * z[ii, jj]
                    den += wgt
            out[i, j] = num / den
    return out


def test_bilateral_matches_oracle(rng):
    from pointcloud_stitching_tpu.ops import bilateral_depth
    depth = (1000 + rng.normal(0, 8, (12, 16))).astype(np.uint16)
    depth[3:5, 6:9] = 0                      # holes
    depth[:, 10:] = 2000                     # a hard step
    got = np.asarray(bilateral_depth(depth, sigma_spatial=2.0,
                                     sigma_range=0.02, radius=3))
    want = bilateral_np(depth, 2.0, 0.02 / 0.001, 3)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=0.02)
    assert np.all(got[3:5, 6:9] == 0)        # holes stay holes


def test_bilateral_smooths_but_keeps_edges(rng):
    from pointcloud_stitching_tpu.ops import bilateral_depth
    depth = np.full((40, 60), 1000.0, np.float32)
    depth[:, 30:] = 1500.0                   # 0.5 m step >> sigma_range
    noisy = depth + rng.normal(0, 5, depth.shape).astype(np.float32)
    out = np.asarray(bilateral_depth(noisy, sigma_spatial=3.0,
                                     sigma_range=0.02, radius=6))
    # noise drops by >3x away from borders/edge...
    inner = (slice(8, 32), slice(8, 22))
    assert out[inner].std() < noisy[inner].std() / 3
    # ...and the step survives un-blended (no mid values near the edge)
    assert np.all(np.abs(out[:, 28:32] - depth[:, 28:32]) < 25)


def test_bilateral_batched_and_uint16(rng):
    from pointcloud_stitching_tpu.ops import bilateral_depth
    d = (1000 + rng.normal(0, 5, (2, 10, 12))).astype(np.uint16)
    out = np.asarray(bilateral_depth(d, radius=2))
    assert out.shape == (2, 10, 12) and out.dtype == np.float32
    single = np.asarray(bilateral_depth(d[1], radius=2))
    np.testing.assert_allclose(out[1], single, rtol=1e-6)
