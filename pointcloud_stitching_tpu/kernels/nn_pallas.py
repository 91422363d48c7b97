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
            pl.BlockSpec(memory_space=pltpu.ANY),   # rT stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # rsq stays in HBM
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
