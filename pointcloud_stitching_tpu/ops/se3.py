"""SE(3) rigid transforms on padded point clouds.

TPU-native equivalent of ``pcl::transformPointCloud`` with the per-camera
4x4 ``.cal`` extrinsics (reference: src/pcs-multicamera-client.cpp, Eigen
``Matrix4f`` loaded from .cal files; SURVEY.md §2.2 row 2).

``R @ p + t`` is expressed as one [N,3]x[3,3] matmul plus a broadcast add so
XLA fuses it with neighbouring elementwise work (and, batched over cameras,
it maps straight onto the MXU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.types import PointCloud


def se3_apply(T: jax.Array, xyz: jax.Array) -> jax.Array:
    """Apply 4x4 (or batched [...,4,4]) rigid transform(s) to [..., N, 3] points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return (jnp.einsum("...ij,...nj->...ni", R, xyz, precision="highest")
            + t[..., None, :])


def transform_cloud(T: jax.Array, pc: PointCloud) -> PointCloud:
    xyz = se3_apply(T, pc.xyz)
    xyz = jnp.where(pc.mask[..., None], xyz, 0.0)
    return pc.replace(xyz=xyz)


def se3_compose(A: jax.Array, B: jax.Array) -> jax.Array:
    """Return A @ B (apply B first, then A)."""
    return A @ B


def se3_inverse(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3:4]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -Rt @ t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], T.dtype), (*T.shape[:-2], 1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_rt(R: jax.Array, t: jax.Array) -> jax.Array:
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], R.dtype), (*R.shape[:-2], 1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def se3_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.eye(4, dtype=dtype)


def se3_blend(A: jax.Array, B: jax.Array, alpha) -> jax.Array:
    """Blend rigid transforms: (1-alpha)*A + alpha*B, re-projected to SE(3).

    Rotation part: linear blend followed by polar projection (SVD) back to
    the nearest rotation; translation: linear. Used for EMA extrinsic
    tracking, where alpha is small and the transforms are near each other.
    """
    alpha = jnp.asarray(alpha, A.dtype)
    M = (1.0 - alpha) * A[..., :3, :3] + alpha * B[..., :3, :3]
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    S = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), M.shape).copy()
    S = S.at[..., 2, 2].set(det)
    R = U @ S @ Vt
    t = (1.0 - alpha) * A[..., :3, 3] + alpha * B[..., :3, 3]
    return se3_from_rt(R, t)
