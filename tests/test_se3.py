import numpy as np
import jax.numpy as jnp

from pointcloud_stitching_tpu import PointCloud
from pointcloud_stitching_tpu.ops import (se3_apply, se3_compose, se3_inverse,
                                          se3_from_rt, transform_cloud)
from oracle import random_se3, transform_np


def test_se3_apply_matches_oracle(rng):
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    T = random_se3(seed=1)
    out = se3_apply(jnp.asarray(T), jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(out), transform_np(T, pts),
                               atol=1e-5)


def test_se3_inverse_roundtrip(rng):
    T = random_se3(seed=2)
    eye = np.asarray(se3_compose(jnp.asarray(T), se3_inverse(jnp.asarray(T))))
    np.testing.assert_allclose(eye, np.eye(4), atol=1e-6)


def test_se3_batched(rng):
    Ts = np.stack([random_se3(seed=s) for s in range(4)])
    pts = rng.normal(size=(4, 100, 3)).astype(np.float32)
    out = np.asarray(se3_apply(jnp.asarray(Ts), jnp.asarray(pts)))
    for i in range(4):
        np.testing.assert_allclose(out[i], transform_np(Ts[i], pts[i]),
                                   atol=1e-5)


def test_transform_cloud_keeps_invalid_zero(rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    pc = PointCloud.from_points(pts, capacity=16)
    T = random_se3(seed=3)
    out = transform_cloud(jnp.asarray(T), pc)
    assert np.asarray(out.xyz)[10:].sum() == 0.0
    np.testing.assert_allclose(np.asarray(out.xyz)[:10],
                               transform_np(T, pts), atol=1e-5)
