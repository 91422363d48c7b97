"""Offline pairwise registration — the calibration workflow.

TPU-native equivalent of the reference's registration tool (reference:
registration/ directory, adapted from PCL's manual_registration example —
SURVEY.md §3.4): pick >=3 corresponding point pairs between two clouds →
closed-form SVD (Kabsch) solve → optional ICP refinement → write the 4x4
extrinsic as a .cal file the streaming client consumes.

The interactive picking UI is host-side and out of scope for the device
path; this module takes picked index pairs (or none, for pure ICP) and does
the solves on-device.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..io.calio import save_cal
from ..ops.icp import ICPResult, icp_converge
from ..ops.kabsch import kabsch
from ..utils.types import PointCloud


class RegistrationResult(NamedTuple):
    T: jax.Array               # src→dst 4x4
    initial_T: jax.Array       # from correspondences only (pre-ICP)
    icp: Optional[ICPResult]   # None if refinement disabled


def register_from_correspondences(src: PointCloud, dst: PointCloud,
                                  src_idx: Sequence[int],
                                  dst_idx: Sequence[int]) -> jax.Array:
    """Closed-form rigid solve from picked correspondence pairs.

    Mirrors pcl::registration::TransformationEstimationSVD over the picked
    pairs (>=3 non-collinear pairs required for a unique solution).
    """
    si = jnp.asarray(src_idx, jnp.int32)
    di = jnp.asarray(dst_idx, jnp.int32)
    if si.shape != di.shape or si.shape[0] < 3:
        raise ValueError("need >=3 correspondence pairs")
    s = src.xyz[si]
    d = dst.xyz[di]
    w = (src.mask[si] & dst.mask[di]).astype(jnp.float32)
    return kabsch(s, d, w)


def register_pair(src: PointCloud, dst: PointCloud,
                  src_idx: Optional[Sequence[int]] = None,
                  dst_idx: Optional[Sequence[int]] = None,
                  refine: bool = True,
                  max_iterations: int = 50,
                  transformation_epsilon: float = 1e-8,
                  max_corr_dist: float = 0.25,
                  query_tile: int = 1024,
                  ref_tile: int = 4096,
                  trim_fraction: float = 0.0,
                  prune: bool = False) -> RegistrationResult:
    """Full calibration solve: optional picked-pair init + ICP refinement."""
    if src_idx is not None:
        init_T = register_from_correspondences(src, dst, src_idx, dst_idx)
    else:
        init_T = jnp.eye(4, dtype=jnp.float32)
    icp_res = None
    T = init_T
    if refine:
        icp_res = icp_converge(src, dst, init_T=init_T,
                               max_iterations=max_iterations,
                               transformation_epsilon=transformation_epsilon,
                               max_corr_dist=max_corr_dist,
                               query_tile=query_tile, ref_tile=ref_tile,
                               trim_fraction=trim_fraction, prune=prune)
        T = icp_res.T
    return RegistrationResult(T=T, initial_T=init_T, icp=icp_res)


def write_cal(path: str, result: RegistrationResult) -> None:
    save_cal(path, np.asarray(result.T))
