"""Pallas TPU kernel: tiled brute-force nearest-neighbour search.

The flagship kernel: replaces PCL's KD-tree NN with dense blockwise
distance sweeps. The N x M distance matrix is never materialised: the grid
sweeps (query_tile x ref_block) blocks, keeping a running (best_d2,
best_idx) pair resident in the output VMEM block across the sequential
ref-block dimension. 100k x 100k queries touch 40 GB of distances but only
ever hold one ~1 MB block on chip.

Two block-distance methods:
  * 'vpu' (default): direct squared differences via broadcast outer ops —
    with a contraction depth of only 3, the MXU is the wrong unit (a matmul
    pads K to the array depth), and the direct form is exact f32 with no
    |a|^2+|b|^2-2ab cancellation. Measured ~10% faster than 'mxu' on v5e
    (the kernel is min/argmin-pass bound, not matmul bound) and chosen as
    the default for the exactness, not the speed.
  * 'mxu': the distance-matmul form (|q|^2 + |r|^2 - 2 q·r^T) at HIGHEST
    precision — what the BASELINE sketch suggested; kept for comparison and
    for potential high-dimensional feature variants where K is large.

Tie behaviour matches numpy/XLA argmin: the smallest reference index wins
(strict `<` across blocks, min-index within a block).

For large voxel-sorted clouds, ``nearest_neighbors_pruned`` adds exact
key-range pruning (coarse-pass distance bound + block bounding boxes →
contiguous block ranges per query tile): 121 → 25 ms per 131k x 131k ICP
iteration with bit-identical results. See docs/KERNELS.md.

Replaces: pcl::KdTreeFLANN::nearestKSearch(k=1) inside
pcl::IterativeClosestPoint (reference: registration/ tool; SURVEY.md §2.2
row 5). Contract-identical to ops.nn.nearest_neighbors (the XLA version).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FAR = 1e12  # coordinate sentinel for invalid reference points


def _block_d2(q, rT, rsq, precision, method):
    """[QT, MB] squared distances for one block pair.

    method='vpu': direct squared differences via broadcast outer ops. With
    K=3 the MXU is the wrong unit — a matmul pads the contraction to the
    array depth while the VPU does the whole thing in ~9 elementwise passes,
    exactly in f32 and with no |a|^2+|b|^2-2ab cancellation error (and ~10%
    faster than the HIGHEST-precision matmul form on v5e).
    method='mxu': the |q|^2+|r|^2-2qr matmul form (kept for comparison).
    """
    if method == "vpu":
        d2 = jnp.zeros((q.shape[0], rT.shape[1]), jnp.float32)
        for c in range(3):
            diff = q[:, c:c + 1] - rT[c:c + 1, :]
            d2 = d2 + diff * diff
        return d2
    qsq = jnp.sum(q * q, axis=1, keepdims=True)
    cross = jax.lax.dot_general(
        q, rT, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32)
    return qsq + rsq - 2.0 * cross


@partial(jax.jit, static_argnames=("query_tile", "ref_block", "interpret",
                                   "precision", "method"))
def nearest_neighbors_pallas(query: jax.Array, ref: jax.Array,
                             ref_mask: jax.Array | None = None,
                             query_tile: int = 1024, ref_block: int = 1024,
                             interpret: bool = False,
                             precision: str = "highest",
                             method: str = "vpu"):
    """For each query point, index + squared distance of nearest ref point.

    Same contract as ops.nn.nearest_neighbors: (idx [N] i32, d2 [N] f32);
    masked reference points are never matched.

    query_tile of 1024 matches the XLA layout tile of 1-D arrays on TPU
    (the outputs are 1-D running-best vectors; other tile sizes fail Mosaic
    layout checks outside interpret mode).
    """
    # single-pair = batched with B=1 (one kernel implementation to maintain;
    # the DMA-looped kernel is also the fastest)
    ref_mask_b = None if ref_mask is None else ref_mask[None]
    idx, d2 = nearest_neighbors_pallas_batched(
        query[None], ref[None], ref_mask_b, query_tile=query_tile,
        ref_block=ref_block, interpret=interpret, precision=precision,
        method=method)
    return idx[0], d2[0]


def prepare_ref_batched(ref: jax.Array, ref_mask: jax.Array | None,
                        ref_block: int = 1024):
    """Pad/transpose the reference once for repeated batched-NN calls.

    ICP calls NN every iteration against the SAME reference cloud; doing
    this prep per iteration wastes a transpose+pad of the whole ref. Returns
    (rT [B, 8, Mpad], rsq [B, 1, Mpad]).
    """
    b, m, _ = ref.shape
    if ref_mask is None:
        ref_mask = jnp.ones((b, m), bool)
    refm = jnp.where(ref_mask[..., None], ref, _FAR)
    mpad = -(-m // ref_block) * ref_block
    rp = jnp.pad(refm, ((0, 0), (0, mpad - m), (0, 0)), constant_values=_FAR)
    rsq = jnp.sum(rp * rp, axis=-1)[:, None, :]
    rT = jnp.swapaxes(jnp.pad(rp, ((0, 0), (0, 0), (0, 5))), 1, 2)
    return rT, rsq


def _nn_kernel_dma(q_ref, rT_hbm, rsq_hbm, d2_ref, idx_ref,
                   rT_s, rsq_s, sem_rT, sem_rsq, *,
                   ref_block, nm, precision, method):
    """One (batch, query-tile) step; sweeps all ref blocks internally with
    double-buffered HBM→VMEM DMA. Versus a third grid dimension this cuts
    grid-step overhead ~8x and overlaps the ref fetch with the distance
    math."""
    bb = pl.program_id(0)
    q = q_ref[...]                                     # [QT, 8]
    need_rsq = method == "mxu"

    def dma_rT(slot, j):
        return pltpu.make_async_copy(
            rT_hbm.at[bb, :, pl.ds(j * ref_block, ref_block)],
            rT_s.at[slot], sem_rT.at[slot])

    def dma_rsq(slot, j):
        return pltpu.make_async_copy(
            rsq_hbm.at[bb, :, pl.ds(j * ref_block, ref_block)],
            rsq_s.at[slot], sem_rsq.at[slot])

    dma_rT(0, 0).start()
    if need_rsq:
        dma_rsq(0, 0).start()

    def body(j, carry):
        best_d2, best_idx = carry
        slot = j % 2

        @pl.when(j + 1 < nm)
        def _():
            dma_rT((j + 1) % 2, j + 1).start()
            if need_rsq:
                dma_rsq((j + 1) % 2, j + 1).start()

        dma_rT(slot, j).wait()
        if need_rsq:
            dma_rsq(slot, j).wait()
        d2 = _block_d2(q, rT_s[slot], rsq_s[slot], precision, method)
        # min + masked index-min beats jnp.argmin here (measured 2.5 vs
        # 3.0 ms on the ring workload) and keeps first-tie semantics
        m = jnp.min(d2, axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        am = jnp.min(jnp.where(d2 <= m[:, None], cols, jnp.int32(2 ** 30)),
                     axis=1)
        gidx = j * ref_block + am
        better = m < best_d2
        return (jnp.where(better, m, best_d2),
                jnp.where(better, gidx, best_idx))

    init = (q[:, 0] * 0.0 + jnp.inf, (q[:, 0] * 0.0).astype(jnp.int32))
    best_d2, best_idx = jax.lax.fori_loop(0, nm, body, init)
    d2_ref[...] = best_d2
    idx_ref[...] = best_idx


@partial(jax.jit, static_argnames=("query_tile", "ref_block", "interpret",
                                   "precision", "method", "num_ref"))
def nn_batched_prepared(query: jax.Array, rT: jax.Array, rsq: jax.Array,
                        num_ref: int, query_tile: int = 1024,
                        ref_block: int = 1024, interpret: bool = False,
                        precision: str = "highest", method: str = "vpu"):
    """Batched NN against a pre-prepared reference (see prepare_ref_batched)."""
    b, n, _ = query.shape
    mpad = rT.shape[-1]
    npad = -(-n // query_tile) * query_tile
    qp = jnp.pad(query, ((0, 0), (0, npad - n), (0, 8 - query.shape[-1])))
    qp = qp.reshape(b * npad, 8)

    nq, nm = npad // query_tile, mpad // ref_block
    d2, idx = pl.pallas_call(
        partial(_nn_kernel_dma, ref_block=ref_block, nm=nm,
                precision=jax.lax.Precision(precision.lower()),
                method=method),
        out_shape=[jax.ShapeDtypeStruct((b * npad,), jnp.float32),
                   jax.ShapeDtypeStruct((b * npad,), jnp.int32)],
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((query_tile, 8), lambda bb, i: (bb * nq + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # rT stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # rsq stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((query_tile,), lambda bb, i: (bb * nq + i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile,), lambda bb, i: (bb * nq + i,),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, ref_block), jnp.float32),
            pltpu.VMEM((2, 1, ref_block), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(qp, rT, rsq)
    d2 = d2.reshape(b, npad)[:, :n]
    idx = jnp.minimum(idx.reshape(b, npad)[:, :n], num_ref - 1)
    return idx, jnp.maximum(d2, 0.0)


@partial(jax.jit, static_argnames=("query_tile", "ref_block", "interpret",
                                   "precision", "method"))
def nearest_neighbors_pallas_batched(query: jax.Array, ref: jax.Array,
                                     ref_mask: jax.Array | None = None,
                                     query_tile: int = 1024,
                                     ref_block: int = 1024,
                                     interpret: bool = False,
                                     precision: str = "highest",
                                     method: str = "vpu"):
    """Batched NN: query [B, N, 3] vs ref [B, M, 3] pairwise per batch row.

    One kernel over a (B, nq, nm) grid — vmap of the unbatched kernel can't
    lower on TPU (the batched 1-D outputs get untileable block shapes), so
    the batch is a real grid dimension and the per-query outputs stay flat
    [B*Npad]. Used by the ring-ICP drift correction (ncam-1 pairs at once).
    """
    rT, rsq = prepare_ref_batched(ref, ref_mask, ref_block)
    return nn_batched_prepared(query, rT, rsq, num_ref=ref.shape[1],
                               query_tile=query_tile, ref_block=ref_block,
                               interpret=interpret, precision=precision,
                               method=method)

def _nn_kernel_dma_ranged(jlo_ref, jhi_ref, q_ref, rT_hbm, rsq_hbm,
                          d2_ref, idx_ref, rT_s, rsq_s, sem_rT, sem_rsq, *,
                          ref_block, precision, method):
    """Range-pruned variant: only sweeps ref blocks [jlo, jhi] for this
    query tile (scalar-prefetched per (batch, tile)). The caller guarantees
    every block that could hold a nearer neighbour than the tile's known
    upper bound lies inside the range, so results stay exact.
    """
    bb = pl.program_id(0)
    i = pl.program_id(1)
    nq = pl.num_programs(1)
    step = bb * nq + i
    jlo = jlo_ref[step]
    jhi = jhi_ref[step]
    q = q_ref[...]
    need_rsq = method == "mxu"

    def dma_rT(slot, j):
        return pltpu.make_async_copy(
            rT_hbm.at[bb, :, pl.ds(j * ref_block, ref_block)],
            rT_s.at[slot], sem_rT.at[slot])

    def dma_rsq(slot, j):
        return pltpu.make_async_copy(
            rsq_hbm.at[bb, :, pl.ds(j * ref_block, ref_block)],
            rsq_s.at[slot], sem_rsq.at[slot])

    dma_rT(0, jlo).start()
    if need_rsq:
        dma_rsq(0, jlo).start()

    def body(j, carry):
        best_d2, best_idx = carry
        slot = (j - jlo) % 2

        @pl.when(j + 1 <= jhi)
        def _():
            dma_rT((j - jlo + 1) % 2, j + 1).start()
            if need_rsq:
                dma_rsq((j - jlo + 1) % 2, j + 1).start()

        dma_rT(slot, j).wait()
        if need_rsq:
            dma_rsq(slot, j).wait()
        d2 = _block_d2(q, rT_s[slot], rsq_s[slot], precision, method)
        m = jnp.min(d2, axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        am = jnp.min(jnp.where(d2 <= m[:, None], cols, jnp.int32(2 ** 30)),
                     axis=1)
        gidx = j * ref_block + am
        better = m < best_d2
        return (jnp.where(better, m, best_d2),
                jnp.where(better, gidx, best_idx))

    init = (q[:, 0] * 0.0 + jnp.inf, (q[:, 0] * 0.0).astype(jnp.int32))
    best_d2, best_idx = jax.lax.fori_loop(jlo, jhi + 1, body, init)
    d2_ref[...] = best_d2
    idx_ref[...] = best_idx


@partial(jax.jit, static_argnames=("query_tile", "ref_block", "interpret",
                                   "precision", "method", "num_ref"))
def nn_batched_prepared_ranged(query: jax.Array, rT: jax.Array,
                               rsq: jax.Array, jlo: jax.Array,
                               jhi: jax.Array, num_ref: int,
                               query_tile: int = 1024,
                               ref_block: int = 1024,
                               interpret: bool = False,
                               precision: str = "highest",
                               method: str = "vpu"):
    """Batched NN sweeping only blocks [jlo, jhi] per (batch, query tile).

    jlo/jhi: [B, nq] int32 inclusive block ranges (see
    nearest_neighbors_pruned for how exact ranges are derived).
    """
    b, n, _ = query.shape
    npad = -(-n // query_tile) * query_tile
    qp = jnp.pad(query, ((0, 0), (0, npad - n), (0, 8 - query.shape[-1])))
    qp = qp.reshape(b * npad, 8)
    nq = npad // query_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((query_tile, 8),
                         lambda bb, i, *_: (bb * nq + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((query_tile,), lambda bb, i, *_: (bb * nq + i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile,), lambda bb, i, *_: (bb * nq + i,),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, ref_block), jnp.float32),
            pltpu.VMEM((2, 1, ref_block), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    d2, idx = pl.pallas_call(
        partial(_nn_kernel_dma_ranged, ref_block=ref_block,
                precision=jax.lax.Precision(precision.lower()),
                method=method),
        out_shape=[jax.ShapeDtypeStruct((b * npad,), jnp.float32),
                   jax.ShapeDtypeStruct((b * npad,), jnp.int32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(jlo.reshape(-1), jhi.reshape(-1), qp, rT, rsq)
    d2 = d2.reshape(b, npad)[:, :n]
    idx = jnp.minimum(idx.reshape(b, npad)[:, :n], num_ref - 1)
    return idx, jnp.maximum(d2, 0.0)


def block_ranges(query: jax.Array, query_mask: jax.Array, ref: jax.Array,
                 ref_mask: jax.Array, d2_ub: jax.Array,
                 query_tile: int = 1024, ref_block: int = 1024):
    """Exact per-query-tile ref-block ranges from bounding-box lower bounds.

    Voxel-sorted reference clouds are spatially coherent, so consecutive
    blocks have compact bounding boxes and the blocks that can beat a known
    upper bound d2_ub form (a superset of) a contiguous key range.

    Args:
      query: [B, N, 3]; query_mask: [B, N].
      ref: [B, M, 3]; ref_mask: [B, M].
      d2_ub: [B, N] — per-query upper bound on the squared NN distance
        (e.g. from a coarse pass over a subsampled ref). Must satisfy
        d2_ub >= true NN squared distance.
    Returns (jlo, jhi): [B, nq] inclusive block index ranges.
    """
    b, n, _ = query.shape
    m = ref.shape[1]
    npad = -(-n // query_tile) * query_tile
    mpad = -(-m // ref_block) * ref_block
    nq, nm = npad // query_tile, mpad // ref_block

    def bbox(x, mask, tile, tpad):
        big = jnp.float32(3.0e38)
        xm = jnp.where(mask[..., None], x, big)
        xM = jnp.where(mask[..., None], x, -big)
        xm = jnp.pad(xm, ((0, 0), (0, tpad - x.shape[1]), (0, 0)),
                     constant_values=big)
        xM = jnp.pad(xM, ((0, 0), (0, tpad - x.shape[1]), (0, 0)),
                     constant_values=-big)
        lo = jnp.min(xm.reshape(b, -1, tile, 3), axis=2)
        hi = jnp.max(xM.reshape(b, -1, tile, 3), axis=2)
        return lo, hi  # [B, ntiles, 3]

    qlo, qhi = bbox(query, query_mask, query_tile, npad)
    rlo, rhi = bbox(ref, ref_mask, ref_block, mpad)

    # squared box-to-box distance [B, nq, nm]
    gap = jnp.maximum(
        0.0, jnp.maximum(qlo[:, :, None] - rhi[:, None, :],
                         rlo[:, None, :] - qhi[:, :, None]))
    lb2 = jnp.sum(gap * gap, axis=-1)

    ubm = jnp.where(query_mask, d2_ub, 0.0)
    ubm = jnp.pad(ubm, ((0, 0), (0, npad - n)))
    ub_tile = jnp.max(ubm.reshape(b, nq, query_tile), axis=-1)  # [B, nq]

    # empty ref blocks (all-masked) get +inf lower bound automatically via
    # the sentinel bbox; candidate blocks:
    cand = lb2 <= ub_tile[..., None] * (1.0 + 1e-5) + 1e-12
    idxs = jnp.arange(nm, dtype=jnp.int32)
    jlo = jnp.min(jnp.where(cand, idxs, nm - 1), axis=-1)
    jhi = jnp.max(jnp.where(cand, idxs, 0), axis=-1)
    jhi = jnp.maximum(jhi, jlo)  # degenerate tiles sweep one block
    return jlo.astype(jnp.int32), jhi.astype(jnp.int32)


@partial(jax.jit, static_argnames=("query_tile", "ref_block",
                                   "coarse_stride", "interpret", "precision",
                                   "method"))
def nearest_neighbors_pruned(query: jax.Array, ref: jax.Array,
                             ref_mask: jax.Array | None = None,
                             query_mask: jax.Array | None = None,
                             coarse_stride: int = 16,
                             query_tile: int = 1024, ref_block: int = 2048,
                             interpret: bool = False,
                             precision: str = "highest",
                             method: str = "vpu"):
    """Exact batched NN with key-range pruning (BVH-lite for sorted clouds).

    Pass 1 searches a stride-subsampled reference for a per-query upper
    bound; pass 2 sweeps only the ref blocks whose bounding boxes can beat
    that bound. On voxel-sorted clouds after rough alignment this skips the
    vast majority of blocks; results remain exactly the brute-force answer
    (the subsampled ref is a subset, so pass 1's bound is valid).
    """
    b, n, _ = query.shape
    m = ref.shape[1]
    if ref_mask is None:
        ref_mask = jnp.ones((b, m), bool)
    if query_mask is None:
        query_mask = jnp.ones((b, n), bool)

    coarse_ref = ref[:, ::coarse_stride]
    coarse_mask = ref_mask[:, ::coarse_stride]
    _, d2_ub = nearest_neighbors_pallas_batched(
        query, coarse_ref, coarse_mask, query_tile=query_tile,
        ref_block=ref_block, interpret=interpret, precision=precision,
        method=method)

    jlo, jhi = block_ranges(query, query_mask, ref, ref_mask, d2_ub,
                            query_tile=query_tile, ref_block=ref_block)
    rT, rsq = prepare_ref_batched(ref, ref_mask, ref_block)
    return nn_batched_prepared_ranged(
        query, rT, rsq, jlo, jhi, num_ref=m, query_tile=query_tile,
        ref_block=ref_block, interpret=interpret, precision=precision,
        method=method)
