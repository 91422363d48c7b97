"""Moving-least-squares smoothing (pcl::MovingLeastSquares role)."""
import jax.numpy as jnp
import numpy as np

from pointcloud_stitching_tpu import PointCloud
from pointcloud_stitching_tpu.ops import mls_smooth


def _cloud(pts, cap=None, rgb=None):
    pts = np.asarray(pts, np.float32)
    cap = cap or len(pts)
    xyz = np.zeros((cap, 3), np.float32)
    mask = np.zeros((cap,), bool)
    xyz[:len(pts)] = pts
    mask[:len(pts)] = True
    r = None
    if rgb is not None:
        r = np.zeros((cap, 3), np.float32)
        r[:len(pts)] = rgb
        r = jnp.asarray(r)
    return PointCloud(xyz=jnp.asarray(xyz), mask=jnp.asarray(mask), rgb=r)


def _mls_np(pts, radius, sg=None):
    """Direct numpy oracle: kernel-weighted plane fit + projection."""
    sg = sg if sg is not None else radius * radius
    out = pts.copy()
    for i, p in enumerate(pts):
        d2 = np.sum((pts - p) ** 2, axis=-1)
        inside = d2 <= radius * radius
        if inside.sum() - 1 < 3:
            continue
        w = np.where(inside, np.exp(-d2 / sg), 0.0)
        mu = (w[:, None] * pts).sum(0) / w.sum()
        d = pts - mu
        cov = (w[:, None, None] * d[:, :, None] * d[:, None, :]).sum(0) / w.sum()
        _, v = np.linalg.eigh(cov)
        nrm = v[:, 0]
        out[i] = p - nrm * np.dot(nrm, p - mu)
    return out


def test_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 0.5, (300, 3)).astype(np.float32)
    pc = _cloud(pts, cap=384)
    got = np.asarray(mls_smooth(pc, 0.12).xyz)[:300]
    want = _mls_np(pts, 0.12)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_denoises_a_plane():
    """Noisy plane: MLS must cut the out-of-plane variance by >5x while
    moving points essentially only along the normal."""
    rng = np.random.default_rng(1)
    uv = rng.uniform(-1, 1, (3000, 2)).astype(np.float32)
    z = rng.normal(0, 0.004, 3000).astype(np.float32)
    pts = np.stack([uv[:, 0], uv[:, 1], z], -1)
    pc = _cloud(pts)
    sm = np.asarray(mls_smooth(pc, 0.15).xyz)
    assert sm[:, 2].std() < pts[:, 2].std() / 5
    # in-plane drift stays tiny (projection moves along the local normal)
    assert np.abs(sm[:, :2] - pts[:, :2]).max() < 0.01


def test_preserves_curved_geometry():
    """A clean sphere must stay a sphere (radius error << leaf-scale) —
    plane projection flattens only at the neighborhood scale."""
    rng = np.random.default_rng(2)
    v = rng.normal(size=(4000, 3))
    pts = (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)
    pc = _cloud(pts)
    sm = np.asarray(mls_smooth(pc, 0.12).xyz)
    r = np.linalg.norm(sm, axis=-1)
    assert abs(r.mean() - 1.0) < 0.005
    assert r.std() < 0.003


def test_unsupported_points_and_padding_untouched():
    pts = np.array([[0, 0, 0], [5, 5, 5]], np.float32)  # two loners
    pc = _cloud(pts, cap=8)
    out = mls_smooth(pc, 0.1)
    np.testing.assert_array_equal(np.asarray(out.xyz)[:2], pts)
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(pc.mask))


def test_rgb_and_mask_passthrough_and_batched():
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 0.3, (200, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (200, 3)).astype(np.float32)
    pc = _cloud(pts, cap=256, rgb=rgb)
    out = mls_smooth(pc, 0.1)
    np.testing.assert_array_equal(np.asarray(out.rgb), np.asarray(pc.rgb))
    # batched form matches per-cloud calls
    b = PointCloud(xyz=jnp.stack([pc.xyz, pc.xyz]),
                   mask=jnp.stack([pc.mask, pc.mask]))
    ob = mls_smooth(b, 0.1)
    np.testing.assert_allclose(np.asarray(ob.xyz[0]),
                               np.asarray(mls_smooth(
                                   PointCloud(xyz=pc.xyz, mask=pc.mask),
                                   0.1).xyz), atol=1e-6)


def test_estimate_normals_plane_and_sphere():
    """pcl::NormalEstimation role: neighborhood-PCA normals with the
    flip-toward-viewpoint convention."""
    from pointcloud_stitching_tpu.ops import estimate_normals
    rng = np.random.default_rng(4)
    # a z = 1.5 plane seen from the origin: normals ~ -z after the flip
    uv = rng.uniform(-1, 1, (2000, 2)).astype(np.float32)
    plane = np.stack([uv[:, 0], uv[:, 1], np.full(2000, 1.5, np.float32)],
                     -1)
    pc = _cloud(plane)
    n, ok = estimate_normals(pc, 0.15)
    n, ok = np.asarray(n), np.asarray(ok)
    assert ok.sum() > 1900
    dots = n[ok] @ np.array([0.0, 0.0, -1.0], np.float32)
    assert np.all(dots > 0.999), dots.min()
    np.testing.assert_allclose(np.linalg.norm(n[ok], axis=-1), 1.0,
                               atol=1e-5)

    # a unit sphere seen from its center: every normal points inward
    v = rng.normal(size=(3000, 3))
    sph = (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)
    n2, ok2 = estimate_normals(_cloud(sph), 0.15, viewpoint=(0, 0, 0))
    n2, ok2 = np.asarray(n2), np.asarray(ok2)
    inward = np.sum(n2[ok2] * (-sph[ok2]), axis=-1)
    assert np.all(inward > 0.97), inward.min()


def test_estimate_normals_far_from_origin():
    """At-range robustness (r5 review): the moments engine accumulates
    QUERY-CENTERED displacements, so a plane 100 m out gives the same
    clean normals as one at the origin. The origin-moment form
    (E[pp^T] - mu mu^T) cancels catastrophically there — second moments
    ~1e4 with f32 ulp ~1e-3 swamp the ~1e-2-scale local covariance."""
    from pointcloud_stitching_tpu.ops import estimate_normals
    rng = np.random.default_rng(11)
    uv = rng.uniform(-1, 1, (2000, 2)).astype(np.float32)
    plane = np.stack([uv[:, 0] + 80.0, uv[:, 1] - 60.0,
                      np.full(2000, 50.0, np.float32)], -1)
    n, ok = estimate_normals(_cloud(plane), 0.15,
                             viewpoint=(80.0, -60.0, 0.0))
    n, ok = np.asarray(n), np.asarray(ok)
    assert ok.sum() > 1900
    dots = n[ok] @ np.array([0.0, 0.0, -1.0], np.float32)
    assert np.all(dots > 0.999), dots.min()


def test_estimate_normals_unsupported_zero():
    from pointcloud_stitching_tpu.ops import estimate_normals
    pts = np.array([[0, 0, 1], [5, 5, 5]], np.float32)
    n, ok = estimate_normals(_cloud(pts, cap=8), 0.1)
    assert not np.asarray(ok).any()
    assert np.abs(np.asarray(n)).sum() == 0
