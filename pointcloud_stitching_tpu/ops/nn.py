"""Brute-force nearest-neighbour correspondence search, tiled for TPU.

TPU-native replacement for ``pcl::KdTreeFLANN`` inside PCL's ICP (reference:
registration/ tool, ``pcl::IterativeClosestPoint``; SURVEY.md §2.2 row 5).

A KD-tree is pointer-chasing and branch-heavy — the worst possible fit for a
systolic array. The TPU-native formulation is a tiled distance-matrix sweep:

    d2[i, j] = |q_i|^2 + |r_j|^2 - 2 q_i . r_j

where the cross term is a matmul on the MXU. The full N x M matrix is never
materialised (100k x 100k would be 40 GB): we sweep reference tiles with a
running (best_d2, best_idx) pair, and query tiles via an outer ``lax.map``.
Intermediates stay at [query_tile x ref_tile].

A Pallas kernel with the same contract lives in kernels/nn_pallas.py; this
module is the portable XLA version and the numerical contract for both.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_FAR = 1e12  # coordinate sentinel for invalid reference points


def _pad_to(x: jax.Array, n: int, value=0.0) -> jax.Array:
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, cfg, constant_values=value)


@partial(jax.jit, static_argnames=("query_tile", "ref_tile", "impl",
                                   "interpret"))
def nearest_neighbors(query: jax.Array, ref: jax.Array,
                      ref_mask: jax.Array | None = None,
                      query_tile: int = 1024, ref_tile: int = 4096,
                      impl: str = "auto", interpret: bool = False):
    """For each query point, index + squared distance of its nearest ref point.

    Args:
      query: [N, 3] float32.
      ref: [M, 3] float32.
      ref_mask: [M] bool; invalid reference points are never matched.
      impl: 'auto' | 'pallas' | 'xla'. 'auto' picks the Pallas MXU kernel on
        TPU (kernels/nn_pallas.py) and the portable XLA sweep elsewhere.
    Returns:
      (idx [N] int32, d2 [N] float32). If every ref point is masked out the
      distances are ~_FAR^2; callers gate on that via their own masks.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from ..kernels.nn_pallas import nearest_neighbors_pallas
        # compiled mode needs 1024-wide 1-D output tiles, and the
        # [query_tile x ref_block] distance intermediate must stay well
        # under the 16 MB VMEM budget (1024x2048 f32 = 8 MB). Ref block
        # width is sweep-length dependent (measured on v5e): short sweeps
        # want 2048 (fewer DMA waits/min passes: drift stage 7.75 ->
        # 6.09 ms) but long sweeps want 1024 (121 vs 169 ms at 131k —
        # the 8 MB intermediate stalls the double buffering); interpret
        # mode (CPU tests) honours the caller's tiles
        qt = query_tile if interpret else 1024
        rb = ref_tile if interpret else (2048 if ref.shape[0] <= 8192
                                         else 1024)
        return nearest_neighbors_pallas(query, ref, ref_mask,
                                        query_tile=qt, ref_block=rb,
                                        interpret=interpret)
    n, m = query.shape[0], ref.shape[0]
    if ref_mask is None:
        ref_mask = jnp.ones((m,), bool)
    refm = jnp.where(ref_mask[:, None], ref, _FAR)

    n_pad = -(-n // query_tile) * query_tile
    m_pad = -(-m // ref_tile) * ref_tile
    qp = _pad_to(query, n_pad)
    rp = _pad_to(refm, m_pad, value=_FAR)
    r_sq = jnp.sum(rp * rp, axis=-1)  # [m_pad]

    r_tiles = rp.reshape(m_pad // ref_tile, ref_tile, 3)
    rsq_tiles = r_sq.reshape(m_pad // ref_tile, ref_tile)

    def per_query_tile(q):  # q: [query_tile, 3]
        q_sq = jnp.sum(q * q, axis=-1)  # [QT]

        def body(carry, tile):
            best_d2, best_idx = carry
            rt, rsqt, tile_i = tile
            # precision='highest' keeps the MXU in full-f32 passes: the
            # |q|^2+|r|^2-2qr decomposition amplifies bf16 rounding into
            # centimetre-scale distance errors otherwise (PCL parity breaks).
            cross = jnp.dot(q, rt.T, preferred_element_type=jnp.float32,
                            precision="highest")
            d2 = q_sq[:, None] + rsqt[None, :] - 2.0 * cross  # [QT, RT]
            loc = jnp.argmin(d2, axis=1)
            loc_d2 = jnp.take_along_axis(d2, loc[:, None], axis=1)[:, 0]
            better = loc_d2 < best_d2
            best_d2 = jnp.where(better, loc_d2, best_d2)
            best_idx = jnp.where(better, tile_i * ref_tile + loc, best_idx)
            return (best_d2, best_idx), None

        # derive the init carry from q so shard_map's varying-axis typing
        # matches the loop outputs (constants are 'unvarying' under manual
        # sharding and break lax.scan's carry type check)
        init = (q[:, 0] * 0.0 + jnp.inf,
                (q[:, 0] * 0.0).astype(jnp.int32))
        tiles = (r_tiles, rsq_tiles,
                 jnp.arange(m_pad // ref_tile, dtype=jnp.int32))
        (best_d2, best_idx), _ = jax.lax.scan(body, init, tiles)
        return best_d2, best_idx

    q_tiles = qp.reshape(n_pad // query_tile, query_tile, 3)
    d2, idx = jax.lax.map(per_query_tile, q_tiles)
    d2 = d2.reshape(-1)[:n]
    idx = jnp.minimum(idx.reshape(-1)[:n], m - 1)
    # clamp fp cancellation: d2 >= 0
    return idx, jnp.maximum(d2, 0.0)
